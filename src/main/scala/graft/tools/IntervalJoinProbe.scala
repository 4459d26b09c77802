package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-5 verdict #2: attribute stream_interval_join's cost (22.6 s at
  * sf0.1, the least baseline headroom in the suite) between per-micro-batch
  * FIXED overhead (state-store commits: runToMemory pins the state
  * partition count for every streaming start — since the round-6
  * PartsSweep, 4 for this pipeline — x 4 join state stores x batches,
  * plus watermark bookkeeping and query planning per trigger) and
  * per-row work. Runs the
  * REAL pipeline at
  * nChunks in {2, 4, 8} x sf in {0.01, 0.1}, median-of-3 each, and fits
  * t = fixed_per_batch * batches + variable(sf) by least squares per sf.
  *
  * If the fit shows cost ~ linear in batch count at FIXED data size, the
  * 22.6 s is harness-shape cost that amortizes at scale (same chunk
  * count, 100x the rows per chunk) — recorded in ARCHITECTURE.md either
  * way. Run: `sbt "runMain graft.tools.IntervalJoinProbe"`.
  */
object IntervalJoinProbe {

  private def timed[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // no shuffle-partition conf here: runToMemory pins the state
    // partition count itself for every streaming start (a session-level
    // setting would be dead code)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sfs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val chunks = Seq(2, 4, 8)
    // warm-up: JIT + codegen + staging of every (sf, chunks) combo
    sfs.foreach(d => chunks.foreach(n =>
      graft.streaming.StreamingPipelines.intervalJoinStream(spark, d, n).count()))
    val rows = for (d <- sfs; n <- chunks) yield {
      val ts = (1 to 3).map(_ => timed(
        graft.streaming.StreamingPipelines.intervalJoinStream(spark, d, n)
          .count())).sorted
      val med = ts(1)
      println(f"[ivprobe] sf=$d%-24s chunks=$n%2d median=$med%7.2fs " +
        f"(min=${ts.head}%.2f max=${ts.last}%.2f)")
      (d, n, med)
    }
    // least-squares fit t = a * chunks + b per sf
    sfs.foreach { d =>
      val pts = rows.filter(_._1 == d).map(r => (r._2.toDouble, r._3))
      val n = pts.size
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val a = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val b = (sy - a * sx) / n
      println(f"[ivprobe] fit sf=$d%-24s per-batch=${a}%6.2fs/chunk " +
        f"base=${b}%6.2fs")
    }
    spark.stop()
  }
}
