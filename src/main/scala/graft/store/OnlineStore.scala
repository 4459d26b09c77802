package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet-backed online/offline feature store standing in for the
  * reference's Redis online store + parquet offline store (ref
  * streaming/core/sinks/redis_sink.py:123-168, feast/feature_views.py:
  * 22-27):
  *
  *  - `history/` — append-only feature rows (the ZSET time-series
  *    analogue; every upsert appends here, partitioned by view name);
  *  - `online/` — latest row per entity key (the HMSET wide-row
  *    analogue), rewritten by MERGE-style upserts.
  *
  * Scale path: on a cluster this is Delta/Iceberg — `MERGE INTO` keyed by
  * the entity for `online/`, partition-pruned appends for `history/`,
  * `foreachBatch` with txnAppId/txnVersion for exactly-once (SURVEY.md
  * W10). Plain parquet keeps this repo dependency-free; the merge is
  * implemented as read-union-dedup-overwrite, which preserves the same
  * semantics (latest (feature_ts, seq) wins per key) at local scale. The
  * idempotence ledger (`_batches/`) makes retried micro-batches no-ops,
  * which is what Delta's txnVersion gives you.
  */
class OnlineStore(spark: SparkSession, root: String) {
  import java.nio.file.{Files, Paths}

  private def path(parts: String*) = (Seq(root) ++ parts).mkString("/")

  private def exists(p: String): Boolean = Files.exists(Paths.get(p))

  /** Upsert one batch of feature rows for a view. Latest row per key wins,
    * ordered by (timestampField, batchSeq). Idempotent per batchId. */
  def upsert(view: FeatureView, batch: DataFrame, batchId: Long): Unit = {
    val marker = Paths.get(path("_batches", view.name, batchId.toString))
    if (Files.exists(marker)) return // replayed batch: exactly-once no-op
    val keys = view.entities.map(_.joinKey)
    val stamped = batch.withColumn("_batch_seq", lit(batchId))

    // history: append-only (ZSET analogue)
    stamped.write.mode(SaveMode.Append).parquet(path("history", view.name))

    // online: merge = union old+new, keep latest per key
    val onlinePath = path("online", view.name)
    val merged =
      if (exists(onlinePath)) spark.read.parquet(onlinePath).unionByName(stamped)
      else stamped
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(view.timestampField).desc, col("_batch_seq").desc)
    val latest = merged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    // overwrite via staging dir (read+overwrite same path is unsafe)
    val stage = onlinePath + "_stage"
    latest.write.mode(SaveMode.Overwrite).parquet(stage)
    spark.read.parquet(stage).write.mode(SaveMode.Overwrite).parquet(onlinePath)

    Files.createDirectories(marker.getParent)
    Files.createFile(marker)
  }

  /** Latest feature rows for the requested keys (S9/J4 point lookup; a
    * broadcast-hash join against the key set — partition pruning on the
    * entity key in the Delta form). */
  def getOnlineFeatures(view: FeatureView, keyDf: DataFrame): DataFrame = {
    val keys = view.entities.map(_.joinKey)
    keyDf.join(spark.read.parquet(path("online", view.name)), keys, "left")
  }

  /** All feature rows for a service's views, joined on their entity keys. */
  def getOnlineFeatures(service: FeatureService, keyDf: DataFrame): DataFrame =
    service.views.foldLeft(keyDf)((df, v) => getOnlineFeatures(v, df))

  /** TTL retention (redis EXPIRE analogue): drop online rows whose
    * feature_timestamp is older than now - ttl. */
  def applyTtl(view: FeatureView, nowMs: Long): Unit = {
    val onlinePath = path("online", view.name)
    if (!exists(onlinePath)) return
    val kept = spark.read.parquet(onlinePath)
      .filter(col(view.timestampField) >= nowMs - view.ttlMs)
    val stage = onlinePath + "_stage"
    kept.write.mode(SaveMode.Overwrite).parquet(stage)
    spark.read.parquet(stage).write.mode(SaveMode.Overwrite).parquet(onlinePath)
  }

  /** Append-only history for a view (offline store / training reads). */
  def history(view: FeatureView): DataFrame =
    spark.read.parquet(path("history", view.name))
}
