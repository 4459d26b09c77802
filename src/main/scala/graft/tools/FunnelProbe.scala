package graft.tools
import org.apache.spark.sql.SparkSession

/** Round-14 (verdict r13 #7): per-stage wall attribution for
  * stream_corpus_funnel via the stageTimes hook — where do its ~5 s go
  * (decontam broadcast build, the stateless-gates streaming query, the
  * fused stateful query, or the batch rollup finale)? The answer decides
  * between a staged-log split (the stream_dedup_minhash
  * fingerprint-service pattern) and documenting the floor. */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 4).foreach { i =>
      val m = scala.collection.mutable.Map[String, Double]()
      val t0 = System.nanoTime()
      graft.streaming.StreamingPipelines
        .curationFunnelStream(spark, dir, stageTimes = m).count()
      val tot = (System.nanoTime() - t0) / 1e9
      val parts = m.toSeq.sortBy(-_._2)
        .map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
      println(f"[funnel] run$i total=$tot%.2f $parts " +
        f"finale=${tot - m.values.sum}%.2f")
    }
    spark.stop()
  }
}
