package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.pipeline.{Ingest, Schemas, XgHybrid}
import graft.sources.{Sinks, Sources}

/** Entry-point-1 ingest, xG hybrid blend/priors, and source/sink
  * semantics (S2/S5/S6/S7).
  */
class IngestSinksSpec extends SparkSpec {
  import spark.implicits._

  test("normalize: upper headers, odds fallback order, key dropna, day-first parse") {
    val raw = Seq(
      ("17/08/2024", "Arsenal", "Chelsea", "2", "1", Some(1.8), Some(2.2)),
      ("bad date", "X", "Y", "0", "0", Some(2.0), None),
      (null, "X", "Y", "1", "1", Some(2.0), None))
      .toDF("Date", "HomeTeam", "AwayTeam", "fthg", "ftag", "PSH", "b365h")
    val out = Ingest.normalize(raw).collect()
    assert(out.length == 1) // bad + null dates dropped
    val r = out(0)
    assert(r.getAs[String]("home_team") == "Arsenal")
    assert(r.getAs[Int]("home_goals") == 2)
    // B365H precedes PSH in the fallback chain
    assert(r.getAs[Double]("home_odds_dec") == 2.2)
    assert(r.getAs[Double]("crowd_index") == 0.7)
    assert(r.getTimestamp(r.fieldIndex("date")).toString.startsWith("2024-08-17"))
  }

  test("ingest unions tolerant frames and sorts by date") {
    val a = Seq(("02/01/2025", "H1", "A1", "1", "0", 2.0))
      .toDF("Date", "HomeTeam", "AwayTeam", "FTHG", "FTAG", "B365H")
    val b = Seq(("01/01/2025", "H2", "A2", "0", "0", 3.0))
      .toDF("Date", "HomeTeam", "AwayTeam", "FTHG", "FTAG", "PSH")
    val out = Ingest.ingest(Seq(a, b)).collect()
    assert(out.map(_.getAs[String]("home_team")).toSeq == Seq("H2", "H1"))
  }

  test("xg blend: 0.6/0.4 when both seasons, pass-through when one, priors dedup") {
    val cur = Seq(("T1", 1, "2.0", "1.0", "1.0", "0.5"), ("T2", 1, "3.0", "2.0", "1.0", "0.2"))
      .toDF("team", "league_id", "xg", "xga", "xgd", "xgd90")
    val last = Seq(("T1", 1, "1.0", "2.0", "-1.0", "-0.5"), ("T3", 1, "4.0", "1.0", "3.0", "1.0"))
      .toDF("team", "league_id", "xg", "xga", "xgd", "xgd90")
    val out = XgHybrid.blend(cur, last).orderBy("team").collect()
    assert(out.map(_.getAs[String]("team")).toSeq == Seq("T1", "T2", "T3"))
    assert(math.abs(out(0).getAs[Double]("xg_hybrid") - 1.6) < 1e-9) // .6*2+.4*1
    assert(out(1).getAs[Double]("xg_hybrid") == 3.0)                 // cur only
    assert(out(2).getAs[Double]("xg_hybrid") == 4.0)                 // last only
    val priors = XgHybrid.teamPriors(
      XgHybrid.blend(cur, last).unionByName(XgHybrid.blend(cur, last)))
    assert(priors.count() == 3) // dedup on team
    val p = priors.orderBy("team").collect()(0)
    // reference clamp bounds: gk ∈ [0.55, 0.90] (bootstrap_team_priors.py:31)
    assert(p.getAs[Double]("gk_rating") >= 0.55 && p.getAs[Double]("gk_rating") <= 0.90)
    assert(p.getAs[Double]("setpiece_rating") >= 0.50 &&
      p.getAs[Double]("setpiece_rating") <= 0.85)
  }

  test("S2 tolerant read: missing path → empty frame with schema") {
    val df = Sources.tolerantCsv(spark, "/tmp/does_not_exist_graft.csv", Schemas.teamsMaster)
    assert(df.isEmpty && df.schema == Schemas.teamsMaster)
  }

  test("S5 single-file csv + in-place overwrite round-trip") {
    val dir = Files.createTempDirectory("graft_sink_").toString
    val target = s"$dir/out.csv"
    val df = Seq(("a", 1), ("b", 2)).toDF("name", "n")
    Sinks.singleFileCsv(df, target)
    assert(Files.exists(Paths.get(target)))
    val lines = Files.readAllLines(Paths.get(target))
    assert(lines.get(0) == "name,n" && lines.size == 3)
    // in-place: read the file we just wrote, transform, overwrite same path
    val read = spark.read.option("header", "true").csv(target)
    Sinks.overwriteCsvInPlace(read.withColumn("n", $"n".cast("int") * 10), target)
    val lines2 = Files.readAllLines(Paths.get(target))
    assert(lines2.size == 3 && lines2.get(1).endsWith("0"))
  }

  test("training-shard writer: one directory+file per shard, all rows kept") {
    val dir = Files.createTempDirectory("graft_shards_").toString
    val docs = (1L to 100L).map(i => (i % 4, i, s"doc$i")).toDF("shard", "doc_id", "text")
    Sinks.trainingShards(docs, s"$dir/out", "shard", 4, "doc_id",
      maxRecordsPerFile = 50L)
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 100)
    assert(back.select("shard").distinct().count() == 4)
    // directory-partitioned: shard=N dirs, each written by ONE task → one
    // part file per shard at this size
    (0 to 3).foreach { sh =>
      val files = Files.list(Paths.get(s"$dir/out/shard=$sh"))
        .filter(_.getFileName.toString.startsWith("part-")).count()
      assert(files == 1L, s"shard $sh has $files part files")
    }
  }

  test("S6 empty-valid csv writes header only; S7 override precedence") {
    val dir = Files.createTempDirectory("graft_sink_").toString
    val t = s"$dir/empty.csv"
    Sinks.emptyValidCsv(Schemas.refBaselines, t)
    assert(Files.readAllLines(Paths.get(t)).get(0) == "ref_name,ref_pen_rate")
    // S7: override used iff schema-valid and non-empty
    val fallback = Seq(("x", 1.0)).toDF("ref_name", "ref_pen_rate")
    val good = Seq(("y", 2.0)).toDF("ref_name", "ref_pen_rate")
    val badSchema = Seq("z").toDF("ref_name")
    assert(Sources.withOverride(Some(good), Seq("ref_name", "ref_pen_rate"), fallback)
      .collect()(0).getString(0) == "y")
    assert(Sources.withOverride(Some(badSchema), Seq("ref_name", "ref_pen_rate"), fallback)
      .collect()(0).getString(0) == "x")
    assert(Sources.withOverride(None, Seq("ref_name"), fallback)
      .collect()(0).getString(0) == "x")
  }
}
