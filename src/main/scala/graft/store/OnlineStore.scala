package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet-backed online/offline feature store standing in for the
  * reference's Redis online store + parquet offline store (ref
  * streaming/core/sinks/redis_sink.py:123-168, feast/feature_views.py:
  * 22-27):
  *
  *  - `history/<view>/batch=<id>/` — append-only feature rows (the ZSET
  *    time-series analogue), one directory per micro-batch;
  *  - `online/<view>/v<id>/` — versioned latest-row-per-key snapshots
  *    (the HMSET wide-row analogue), with an atomically-updated pointer
  *    file naming the current version.
  *
  * Crash/replay discipline (SURVEY.md W10 — the contract Delta's
  * txnAppId/txnVersion provides): every write of batch N is idempotent by
  * PATH — a retried batch overwrites its own `batch=N` history directory
  * (no duplicate appends) and its own `vN` snapshot, and the version
  * pointer flips with an atomic rename. A crash at any point leaves
  * either the old pointer (retry redoes the whole batch) or the new one
  * (marker write is the only remaining step; redo is a no-op) — never a
  * torn online table. The `_batches` marker makes completed batches
  * skip-fast.
  *
  * Scale path: on a cluster this is Delta/Iceberg `MERGE INTO` keyed by
  * the entity plus partition-pruned history appends; plain parquet keeps
  * this repo dependency-free with the same semantics (latest
  * (feature_ts, batch) wins per key).
  */
class OnlineStore(spark: SparkSession, root: String) {
  import java.nio.file.{Files, Paths, StandardCopyOption}
  import java.nio.charset.StandardCharsets

  private def path(parts: String*) = (Seq(root) ++ parts).mkString("/")

  private def exists(p: String): Boolean = Files.exists(Paths.get(p))

  private def pointerPath(view: FeatureView) =
    Paths.get(path("online", view.name, "_latest"))

  private def currentVersion(view: FeatureView): Option[String] =
    if (Files.exists(pointerPath(view)))
      Some(new String(Files.readAllBytes(pointerPath(view)),
        StandardCharsets.UTF_8).trim)
    else None

  private def onlineDf(view: FeatureView): Option[DataFrame] =
    currentVersion(view)
      .map(v => path("online", view.name, v))
      .filter(exists)
      .map(spark.read.parquet(_))

  /** Upsert one batch of feature rows for a view. Latest row per key wins,
    * ordered by (timestampField, batchSeq). Idempotent per batchId. */
  def upsert(view: FeatureView, batch: DataFrame, batchId: Long): Unit = {
    val marker = Paths.get(path("_batches", view.name, batchId.toString))
    if (Files.exists(marker)) return // replayed batch: exactly-once no-op
    val keys = view.entities.map(_.joinKey)
    val stamped = batch.withColumn("_batch_seq", lit(batchId))

    // history: one directory per batch — a retried batch overwrites ITS OWN
    // directory instead of appending duplicates
    stamped.write.mode(SaveMode.Overwrite)
      .parquet(path("history", view.name, s"batch=$batchId"))

    // online: merge previous snapshot + new rows, keep latest per key,
    // write as a NEW version, then atomically flip the pointer
    val merged = onlineDf(view) match {
      case Some(prev) => prev.unionByName(stamped)
      case None => stamped
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(view.timestampField).desc, col("_batch_seq").desc)
    val latest = merged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val version = s"v$batchId"
    latest.write.mode(SaveMode.Overwrite)
      .parquet(path("online", view.name, version))
    val tmp = Paths.get(path("online", view.name, s"_latest.tmp.$batchId"))
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, version.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerPath(view), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)

    Files.createDirectories(marker.getParent)
    Files.createFile(marker)
  }

  /** Latest feature rows for the requested keys (S9/J4 point lookup; a
    * broadcast-hash join against the key set — partition pruning on the
    * entity key in the Delta form). */
  def getOnlineFeatures(view: FeatureView, keyDf: DataFrame): DataFrame =
    onlineDf(view) match {
      case Some(online) =>
        keyDf.join(online, view.entities.map(_.joinKey), "left")
      case None => keyDf
    }

  /** All feature rows for a service's views, joined on their entity keys.
    * Per-view metadata columns (timestamps, batch seq) are prefixed with
    * the view name so multi-view reads never collide. */
  def getOnlineFeatures(service: FeatureService, keyDf: DataFrame): DataFrame =
    service.views.foldLeft(keyDf) { (df, v) =>
      val keys = v.entities.map(_.joinKey)
      onlineDf(v) match {
        case Some(online) =>
          val renamed = online.columns.foldLeft(online.drop("_batch_seq")) {
            case (o, c)
                if c == v.timestampField || c == v.createdTimestampColumn =>
              o.withColumnRenamed(c, s"${v.name}__$c")
            case (o, _) => o
          }
          df.join(renamed, keys, "left")
        case None => df
      }
    }

  /** TTL retention (redis EXPIRE analogue): drop online rows whose
    * feature_timestamp is older than now - ttl, published as a new
    * snapshot version. */
  def applyTtl(view: FeatureView, nowMs: Long): Unit =
    onlineDf(view).foreach { online =>
      val kept = online.filter(col(view.timestampField) >= nowMs - view.ttlMs)
      val version = s"ttl$nowMs"
      kept.write.mode(SaveMode.Overwrite)
        .parquet(path("online", view.name, version))
      val tmp = Paths.get(path("online", view.name, s"_latest.tmp.ttl$nowMs"))
      Files.write(tmp, version.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, pointerPath(view), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }

  /** Current online snapshot for a view (empty frame if never written). */
  def online(view: FeatureView): DataFrame =
    onlineDf(view).getOrElse(spark.emptyDataFrame)

  /** Append-only history for a view (offline store / training reads). */
  def history(view: FeatureView): DataFrame =
    spark.read.parquet(path("history", view.name))
}
