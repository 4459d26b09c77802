package graft.tools
import org.apache.spark.sql.SparkSession
/** Bench-context probe: runs a comma-separated warm-up query list once
  * (untimed), then times the LAST argument query N times in the same
  * JVM — isolates "does running X before Y slow Y down" (heap/JIT/JVM
  * state), the shape of the r6 stream_aligned_window finding. */
object TimeSeq {
  def main(args: Array[String]): Unit = {
    val prefix = args(0).split(",").filter(_.nonEmpty)
    val target = args(1)
    val n = if (args.length > 2) args(2).toInt else 3
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    prefix.foreach { q =>
      val t0 = System.nanoTime(); graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"[tseq] prefix $q ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    (1 to n).foreach { i =>
      val t0 = System.nanoTime(); graft.SparkEntry.queries(target)(spark, dir).count()
      println(f"[tseq] target $target run$i ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
