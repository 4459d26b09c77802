package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 attribution for the funnel's stateless-gates pass (~3 s of
  * stream_corpus_funnel): which column set burns it — quality (stopword
  * filter), repetition (the O(distinct²) per-doc gram counting), the
  * decontamination gramCol (md5 per 8-token window), or the typed map /
  * stream machinery around them. Batch timings over the same docs frame
  * with a noop-style count per stage. */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.TextAnalysis
    def docsToks = graft.core.Tables.documents(spark, dir)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 2)
    def t(name: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"[gate] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    t("base_toks") { docsToks.select(col("doc_id"), size(col("toks"))).count() }
    t("quality") { TextAnalysis.withQualityCols(docsToks)
      .select(col("doc_id"), col("keep")).count() }
    t("repetition") { TextAnalysis.withRepetitionCols(docsToks)
      .select(col("doc_id"), col("keep")).count() }
    t("grams") { docsToks.withColumn("grams", TextAnalysis.gramCol)
      .select(col("doc_id"), size(col("grams"))).count() }
    spark.stop()
  }
}
