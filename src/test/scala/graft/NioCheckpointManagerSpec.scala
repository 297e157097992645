package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.graft.NioCheckpointFileManager

/** Pins the nio checkpoint manager's contract (round 11): the pieces of
  * CheckpointFileManager behavior Structured Streaming's offset/commit
  * logs and the HDFS-backed state store actually rely on.
  */
class NioCheckpointManagerSpec extends SparkSpec {

  private def mgr(root: java.io.File) =
    new NioCheckpointFileManager(new Path(root.toString), new Configuration())

  private def tmpRoot(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_nio_ckpt_").toFile
    d.deleteOnExit()
    d
  }

  test("createAtomic + close publishes the full content atomically") {
    val root = tmpRoot()
    val m = mgr(root)
    val p = new Path(s"$root/offsets/0")
    val out = m.createAtomic(p, overwriteIfPossible = false)
    out.write("v1\n{\"batchWatermarkMs\":0}".getBytes)
    // nothing visible before close (the temp file is dot-prefixed)
    assert(!m.exists(p), "target visible before close")
    out.close()
    assert(m.exists(p))
    val in = m.open(p)
    val buf = new Array[Byte](64)
    val n = in.read(buf)
    assert(new String(buf, 0, n).startsWith("v1"))
    // no temp litter left behind
    val litter = Option(new java.io.File(s"$root/offsets").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("."))
    assert(litter.isEmpty, s"temp litter: ${litter.mkString(",")}")
  }

  test("first-writer-wins: second non-overwrite close throws Hadoop's FileAlreadyExists") {
    val root = tmpRoot()
    val m = mgr(root)
    val p = new Path(s"$root/commits/0")
    val a = m.createAtomic(p, overwriteIfPossible = false)
    a.write("winner".getBytes); a.close()
    val b = m.createAtomic(p, overwriteIfPossible = false)
    b.write("loser".getBytes)
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] { b.close() }
    // winner's content intact, loser's temp removed
    val in = m.open(p); val buf = new Array[Byte](16)
    assert(new String(buf, 0, in.read(buf)) == "winner")
    assert(Option(new java.io.File(s"$root/commits").listFiles())
      .getOrElse(Array.empty).count(_.isFile) == 1)
  }

  test("overwriteIfPossible replaces; cancel leaves no trace") {
    val root = tmpRoot()
    val m = mgr(root)
    val p = new Path(s"$root/state/1.delta")
    val a = m.createAtomic(p, overwriteIfPossible = true)
    a.write("one".getBytes); a.close()
    val b = m.createAtomic(p, overwriteIfPossible = true)
    b.write("two".getBytes); b.close()
    val in = m.open(p); val buf = new Array[Byte](8)
    assert(new String(buf, 0, in.read(buf)) == "two")
    val c = m.createAtomic(p, overwriteIfPossible = true)
    c.write("three".getBytes); c.cancel()
    val in2 = m.open(p); val buf2 = new Array[Byte](8)
    assert(new String(buf2, 0, in2.read(buf2)) == "two", "cancel mutated target")
  }

  test("list/exists/delete/mkdirs + seekable open") {
    val root = tmpRoot()
    val m = mgr(root)
    m.mkdirs(new Path(s"$root/d"))
    for (i <- 0 until 3) {
      val o = m.createAtomic(new Path(s"$root/d/f$i"), overwriteIfPossible = true)
      o.write(s"payload-$i".getBytes); o.close()
    }
    val names = m.list(new Path(s"$root/d")).map(_.getPath.getName).sorted
    assert(names.sameElements(Array("f0", "f1", "f2")))
    // HDFSMetadataLog seeks when replaying logs — pin the Seekable path
    val in = m.open(new Path(s"$root/d/f1"))
    in.seek(8)
    assert(in.read() == '1'.toInt)
    m.delete(new Path(s"$root/d/f1"))
    assert(!m.exists(new Path(s"$root/d/f1")))
    intercept[java.io.FileNotFoundException] {
      m.list(new Path(s"$root/absent"))
    }
  }

  test("refuses non-local schemes at construction") {
    intercept[IllegalArgumentException] {
      new NioCheckpointFileManager(
        new Path("hdfs://nn/checkpoints"), new Configuration())
    }
  }

  test("a full streaming query runs end-to-end on the nio manager") {
    // the integration pin: offsets log, commit log, state store deltas
    // and AvailableNow termination all through the manager
    import org.apache.spark.sql.functions._
    val root = tmpRoot()
    val in = s"$root/in"
    spark.range(0, 1000)
      .select(col("id"),
        (col("id") % 7).as("k"),
        to_timestamp(lit("2024-01-01 00:00:00")).as("ts"))
      .coalesce(1).write.parquet(in)
    val was = spark.conf.getOption(
      "spark.sql.streaming.checkpointFileManagerClass")
    spark.conf.set("spark.sql.streaming.checkpointFileManagerClass",
      "org.apache.spark.sql.graft.NioCheckpointFileManager")
    try {
      val out = s"$root/out"
      val sq = spark.readStream
        .schema("id LONG, k LONG, ts TIMESTAMP")
        .parquet(in)
        .withWatermark("ts", "1 hour")
        .groupBy("k").agg(count(lit(1)).as("n"))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(out); ()
        }
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      sq.awaitTermination()
      sq.stop()
      // the engine's stream-stop discipline: without the release this
      // test's state-store provider stays loaded until the maintenance
      // tick and trips SessionHygieneSpec's steady-state ratchet when
      // the suites share a JVM
      org.apache.spark.sql.graft.StateHooks.releaseAfterStreamStop(spark)
      val got = spark.read.parquet(out)
        .groupBy("k").agg(max("n").as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size == 7 && got.values.sum == 1000L)
      // the manager actually wrote the logs
      assert(new java.io.File(s"$root/ckpt/offsets/0").exists())
      assert(new java.io.File(s"$root/ckpt/commits/0").exists())
    } finally was match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.checkpointFileManagerClass", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.checkpointFileManagerClass")
    }
  }
}
