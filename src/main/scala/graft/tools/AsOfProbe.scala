package graft.tools

import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.queries.Exact._
import graft.store._

/** Round-7 probe for the round-6 verdict's #1 finding: `fs_asof_snapshot`
  * at 20-46 s is the suite's slowest query. The query performs three
  * sequential full-corpus `OnlineStore.upsert` calls before one history
  * read — this probe splits the wall per upsert and per store phase
  * (input agg, snapshot merge+write, read-back) and counts the parquet
  * files each snapshot version materializes, across bucket counts, to
  * attribute where the write amplification lives.
  * Run: `sbt "runMain graft.tools.AsOfProbe"`. Results in
  * ARCHITECTURE.md (§ as-of snapshot write path).
  */
object AsOfProbe {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  private def parquetFiles(p: Path): Int =
    if (!Files.exists(p)) 0
    else {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      try walk.iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
      finally walk.close()
    }

  private val view = FeatureView(
    "user_daily", Seq(Registry.user), ttlMs = 24L * 3600 * 1000,
    schema = StructType(Seq(
      StructField("n_events", LongType), StructField("sum_value", DoubleType))))

  private def daily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("ems", epochMs(col("ts")))
      .withColumn("day", expr("ems div 86400000"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .withColumn("feature_timestamp", (col("day") + 1) * 86400000L - 1)
      .withColumn("computation_timestamp", col("feature_timestamp"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(tag: String, nBuckets: Int, cache: Boolean): Unit = {
      val root = Files.createTempDirectory("graft_asof_probe_")
      val store = new OnlineStore(spark, root.toString, nBuckets = nBuckets)
      val feats0 = daily(spark, dir)
      val feats = if (cache) feats0.cache() else feats0
      val (_, tAgg) = timed(if (cache) feats.count() else feats.limit(1).count())
      val batches = Seq(
        feats.filter(col("day") < 19745L),
        feats.filter(col("day") >= 19745L && col("day") < 19747L),
        feats.filter(col("day") >= 19747L))
      val tUp = batches.zipWithIndex.map { case (b, i) =>
        timed(store.upsert(view, b, i.toLong))._2
      }
      val nFiles = parquetFiles(root.resolve("online"))
      val (_, tRead) = timed(
        store.onlineAsOf(view, maxBatchId = 1L)
          .select(col("user_id"), col("feature_timestamp"), col("n_events"),
            col("sum_value"))
          .orderBy(col("user_id")).count())
      if (cache) feats.unpersist()
      println(f"[asof] $tag%-28s agg=$tAgg%6.2fs up0=${tUp(0)}%6.2fs " +
        f"up1=${tUp(1)}%6.2fs up2=${tUp(2)}%6.2fs read=$tRead%6.2fs " +
        f"total=${tAgg + tUp.sum + tRead}%6.2fs onlineFiles=$nFiles%5d")
    }

    run("warmup", 32, cache = false)
    run("buckets=32 uncached (bench)", 32, cache = false)
    run("buckets=32 cached", 32, cache = true)
    run("buckets=8  cached", 8, cache = true)
    run("buckets=4  cached", 4, cache = true)
    spark.stop()
  }
}
