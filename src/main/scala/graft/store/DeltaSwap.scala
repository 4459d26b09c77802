package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The OnlineStore -> Delta `MERGE INTO` swap path (round-6 verdict #7:
  * jar-arrival readiness). The container ships no Delta jar, so
  * [[OnlineStore]] implements MERGE semantics by hand (bucketed parquet
  * snapshots + manifest flips). When a deployment HAS Delta on the
  * classpath, the hand-rolled store collapses to a Delta table plus the
  * statements generated here — this object is the complete translation
  * layer, derived from the same [[FeatureView]] metadata, so the two
  * paths can never disagree about keys or winner ordering.
  *
  * The contract being preserved (OnlineStore.latestPerKeyOf): the store
  * keeps the latest row per entity key, winner = greatest
  * `(timestampField, _batch_seq)`. A MERGE source must carry at most one
  * row per key ([[dedupeBatch]] — Delta throws
  * `DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW` otherwise), and the
  * matched-update predicate re-states the same ordering so replayed or
  * out-of-order batches can never regress a newer stored row — which is
  * exactly how upsert's snapshot re-rank resolves them.
  *
  * Exercised by `JarReadinessSpec`: jar-free tests pin the generated SQL
  * text; `assume`-gated tests (skipped in this container, live wherever
  * `io.delta` resolves) run the statements against a real Delta table
  * and replay OnlineStore's StoreSpec scenarios through it.
  */
object DeltaSwap {

  /** Latest-per-key dedup of one batch before it becomes a MERGE source —
    * the in-batch half of OnlineStore's winner ordering. */
  def dedupeBatch(view: FeatureView, batch: DataFrame,
      batchId: Long): DataFrame = {
    val stamped = batch.withColumn("_batch_seq", lit(batchId))
    val w = Window
      .partitionBy(view.entities.map(e => col(e.joinKey)): _*)
      .orderBy(col(view.timestampField).desc, col("_batch_seq").desc)
    stamped.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** DDL for the online table: the view's schema + entity keys + the
    * store's bookkeeping column, partitioned like OnlineStore's bucket
    * layout is pruned — by nothing (Delta's data skipping on the key
    * columns' per-file stats replaces the hand-rolled gbucket stats). */
  def createTableSql(view: FeatureView, table: String): String = {
    val keys = view.entities.map(e => s"${e.joinKey} BIGINT")
    val feats = view.schema.fields.map(f => s"${f.name} ${f.dataType.sql}")
    val cols = (keys ++
      Seq(s"${view.timestampField} BIGINT",
          s"${view.createdTimestampColumn} BIGINT", "_batch_seq BIGINT") ++
      feats).mkString(",\n  ")
    s"CREATE TABLE IF NOT EXISTS $table (\n  $cols\n) USING delta"
  }

  /** The upsert itself. `source` must be a view over [[dedupeBatch]]'s
    * output. `WHEN MATCHED` carries the cross-batch half of the winner
    * ordering; `>=` on `_batch_seq` keeps same-key-same-timestamp replays
    * idempotent (last write of the same batch wins, as upsert's
    * directory overwrite does). */
  def mergeSql(view: FeatureView, target: String, source: String): String = {
    val on = view.entities
      .map(e => s"t.${e.joinKey} = s.${e.joinKey}").mkString(" AND ")
    val ts = view.timestampField
    s"""MERGE INTO $target t
       |USING $source s
       |ON $on
       |WHEN MATCHED AND (s.$ts > t.$ts
       |  OR (s.$ts = t.$ts AND s._batch_seq >= t._batch_seq))
       |  THEN UPDATE SET *
       |WHEN NOT MATCHED THEN INSERT *""".stripMargin
  }

  /** TTL pass (OnlineStore.applyTtl): Delta deletes are log-append +
    * data-skipping-pruned, the same touched-files-only cost the manifest
    * min-timestamp stats buy the hand-rolled store. */
  def ttlSql(view: FeatureView, target: String, nowMs: Long): String =
    s"DELETE FROM $target WHERE ${view.timestampField} < ${nowMs - view.ttlMs}"

  /** Retention GC (OnlineStore.gcVersions' `gcGraceMs`): Delta's own
    * VACUUM retention is the contract the store mirrors. */
  def vacuumSql(table: String, graceMs: Long): String =
    s"VACUUM $table RETAIN ${graceMs / 3600000.0} HOURS"

  /** Session confs a Delta deployment needs at build time (SQL extension
    * + catalog); returned as data so launchers can fold them into any
    * builder. */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.extensions" ->
      "io.delta.sql.DeltaSparkSessionExtension",
    "spark.sql.catalog.spark_catalog" ->
      "org.apache.spark.sql.delta.catalog.DeltaCatalog")

  /** True when the Delta jar is on the classpath (gates the live half of
    * JarReadinessSpec). */
  def jarPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.delta.DeltaLog"); true }
    catch { case _: ClassNotFoundException => false }
}
