package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-6 follow-up to IntervalJoinProbe: the interval join's wall at
  * verify scale is ~per-batch fixed cost, and that cost is
  * O(state partitions) — every micro-batch commits every state store in
  * every partition (×4 stores for a stream-stream join). The knob now
  * threads through `runToMemory` per query, so this sweep measures the
  * REAL sf0.1 pipeline at the default 8 chunks across state partitions
  * in {2, 4, 8}, median-of-3 warm, to find the right per-query pin for
  * the suite's worst bench query. Run:
  * `sbt "runMain graft.tools.PartsSweep"`.
  */
object PartsSweep {

  private def timed[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val parts = Seq("2", "4", "8")
    parts.foreach(p => graft.streaming.StreamingPipelines
      .intervalJoinStream(spark, dir, 8, p).count()) // warm-up
    parts.foreach { p =>
      val ts = (1 to 3).map(_ => timed(
        graft.streaming.StreamingPipelines
          .intervalJoinStream(spark, dir, 8, p).count())).sorted
      println(f"[psweep] parts=$p%3s median=${ts(1)}%7.2fs " +
        f"(min=${ts.head}%.2f max=${ts.last}%.2f)")
    }
    spark.stop()
  }
}
