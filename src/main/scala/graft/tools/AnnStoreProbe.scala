package graft.tools
import org.apache.spark.sql.SparkSession

/** Round-14 attribution for the persisted-index family: where do
  * emb_ivfadc_persisted / stream_ivfadc_update spend their seconds —
  * quantizer memo warm-up, the three store upserts (history write +
  * min-stat pre-pass + merged write each), the streaming machinery, or
  * the recall answer's crossJoin grading? Decides whether the remaining
  * cost is the MERGE machinery under test (a floor) or shareable work. */
object AnnStoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFold.register(spark)
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[annprobe] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    (1 to 3).foreach { i =>
      println(s"[annprobe] --- round $i ---")
      var store: graft.store.OnlineStore = null
      t("build_persisted") {
        store = new graft.store.OnlineStore(spark,
          graft.core.EphemeralDirs.tempDir("graft_annprobe_").toString,
          nBuckets = 8)
        graft.queries.Embeddings.buildPersistedIvfadc(spark, dir, store)
      }
      t("answer") {
        graft.queries.Embeddings.ivfadcAnswerFrom(spark, store).count()
      }
      if (i == 1) {
        import scala.jdk.CollectionConverters._
        val root = java.nio.file.Paths.get(store.basePath)
        val walk = java.nio.file.Files.walk(root)
        val parts = try walk.iterator().asScala
          .count(_.getFileName.toString.startsWith("part-"))
        finally walk.close()
        println(s"[annprobe] store part-files total=$parts")
      }
      t("full_stream_update") {
        graft.SparkEntry.queries("stream_ivfadc_update")(spark, dir).count()
      }
      t("full_persisted") {
        graft.SparkEntry.queries("emb_ivfadc_persisted")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
