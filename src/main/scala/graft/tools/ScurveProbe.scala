// Stage-split probe for dedup_minhash_scurve (round 12 — the suite's
// worst query at 8.99 s): times the per-doc signature build, the pair
// join + exact intersect alone, and the full query, so the dominant
// term is measured rather than guessed. Run:
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ScurveProbe"
package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object ScurveProbe {
  private def timed(tag: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[scurveprobe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n%d")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.SortedIntersectCount.register(spark)

    def docs: DataFrame = graft.core.Tables.documents(spark, sfDir)
      .withColumn("toks", split(trim(col("text")), "\\s+"))

    val shingleExpr =
      """array_distinct(transform(sequence(1, size(toks) - 2),
        |    i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
        |                   element_at(toks, i + 2))))""".stripMargin
    val sjExpr =
      """array_sort(array_distinct(transform(sh,
        |  s -> cast(conv(substr(md5(cast(s as binary)), 1, 15), 16, 10)
        |       as bigint))))""".stripMargin
    val siExpr =
      "transform(sh, s -> cast(conv(substr(md5(cast(s as binary)), 1, 8), 16, 10) as bigint))"
    val mhExpr =
      """transform(sequence(0, 7), j -> array_min(transform(si,
        |    x -> ((2*j + 1) * x + 97*j + 13) % 2147483647)))""".stripMargin
    val bandsExpr =
      """transform(sequence(0, 3), b -> concat_ws(':', b,
        |  element_at(mh, 2*b + 1), element_at(mh, 2*b + 2)))""".stripMargin

    def sigSj: DataFrame = docs
      .withColumn("band", expr("size(toks) div 10"))
      .withColumn("sh", expr(shingleExpr))
      .filter(size(col("sh")) > 0)
      .withColumn("sj", expr(sjExpr))
      .select(col("doc_id"), col("lang"), col("band"), col("sj"))

    def sigFull: DataFrame = docs
      .withColumn("band", expr("size(toks) div 10"))
      .withColumn("sh", expr(shingleExpr))
      .filter(size(col("sh")) > 0)
      .withColumn("sj", expr(sjExpr))
      .withColumn("si", expr(siExpr))
      .withColumn("mh", expr(mhExpr))
      .withColumn("bands", expr(bandsExpr))
      .select(col("doc_id"), col("lang"), col("band"), col("sj"), col("bands"))

    def pairsOf(sig: DataFrame, withBands: Boolean): DataFrame = {
      val aCols = Seq(col("lang"), col("band"), col("doc_id").as("doc_a"),
        col("sj").as("sj_a")) ++
        (if (withBands) Seq(col("bands").as("bands_a")) else Nil)
      val bCols = Seq(col("lang"), col("band"), col("doc_id").as("doc_b"),
        col("sj").as("sj_b")) ++
        (if (withBands) Seq(col("bands").as("bands_b")) else Nil)
      sig.select(aCols: _*).join(sig.select(bCols: _*), Seq("lang", "band"))
        .filter(col("doc_a") < col("doc_b"))
    }

    // warm-up (JIT + codegen + page cache)
    sigFull.count()

    (1 to 2).foreach { round =>
      println(s"[scurveprobe] --- round $round ---")
      timed("sig_sj_only")(sigSj.count())
      timed("sig_full (sj+mh+bands)")(sigFull.count())
      timed("pairs_count_only")(pairsOf(sigSj, withBands = false)
        .groupBy(col("lang")).count().count())
      timed("pairs_intersect")(pairsOf(sigSj, withBands = false)
        .withColumn("inter", expr("sorted_intersect_count(sj_a, sj_b)").cast("long"))
        .groupBy(col("lang")).agg(sum(col("inter"))).count())
      timed("pairs_intersect_overlap") {
        val sig = sigFull
        pairsOf(sig, withBands = true)
          .withColumn("inter", expr("sorted_intersect_count(sj_a, sj_b)").cast("long"))
          .withColumn("collided", arrays_overlap(col("bands_a"), col("bands_b")))
          .groupBy(col("lang"))
          .agg(sum(col("inter")), sum(when(col("collided"), 1L).otherwise(0L)))
          .count()
      }
      timed("full_registered_query")(
        graft.SparkEntry.queries("dedup_minhash_scurve")(spark, sfDir).count())
    }
    spark.stop()
  }
}
