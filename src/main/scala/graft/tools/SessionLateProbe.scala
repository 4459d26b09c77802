package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-5 verdict "what's wrong" #2: stream_session_late_update showed a
  * 1.6x run-to-run spread (5.18-8.24 s over the driver's 3 runs) — the
  * widest in the suite — suspected to be the session-retraction
  * re-sessionize cost interacting with chunk boundaries. Round 6 made
  * that walk suffix-incremental (full re-walk only on merge-inducing
  * late arrivals), so the variable O(buffer)-per-batch term should be
  * gone: this probe runs the REAL late-replay session pipeline at
  * nChunks in {2, 4, 8}, 3 timed runs each (median + min/max), and fits
  * t = fixed_per_batch * chunks + base, the same attribution
  * IntervalJoinProbe produced for the join. Numbers land in
  * ARCHITECTURE.md. Run: `sbt "runMain graft.tools.SessionLateProbe"`.
  *
  * `SPARK_GRAFT_LATE_PIPELINE=stats` probes the STATS member
  * (stream_anchored_stats_late_update) through the identical grid — the
  * suite's widest spread in the round-6 bench (8.0-21.6 s across 3 runs;
  * per-key state there is ~10 rows at sf0.1, so an algorithmic cause is
  * implausible and the grid + fit either pins the cost as fixed
  * per-batch overhead or exposes a variable term.
  */
object SessionLateProbe {

  private def timed[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // no shuffle-partition conf: runToMemory pins state partitions itself
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pipeline = sys.env.getOrElse("SPARK_GRAFT_LATE_PIPELINE", "session")
    def run(n: Int): Long = pipeline match {
      case "stats" => graft.streaming.StreamingPipelines
        .anchoredStatsLateUpdate(spark, dir, n).count()
      case _ => graft.streaming.StreamingPipelines
        .sessionStepsLateUpdate(spark, dir, n).count()
    }
    val chunks = Seq(2, 4, 8)
    // warm-up: JIT + codegen + chunk staging for every combo
    chunks.foreach(run)
    val rows = chunks.map { n =>
      val ts = (1 to 3).map(_ => timed(run(n))).sorted
      println(f"[slprobe:$pipeline] chunks=$n%2d median=${ts(1)}%7.2fs " +
        f"(min=${ts.head}%.2f max=${ts.last}%.2f spread=${ts.last / ts.head}%.2fx)")
      (n.toDouble, ts(1))
    }
    val n = rows.size
    val sx = rows.map(_._1).sum; val sy = rows.map(_._2).sum
    val sxx = rows.map(p => p._1 * p._1).sum
    val sxy = rows.map(p => p._1 * p._2).sum
    val a = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val b = (sy - a * sx) / n
    println(f"[slprobe:$pipeline] fit per-batch=${a}%6.2fs/chunk base=${b}%6.2fs")
    spark.stop()
  }
}
