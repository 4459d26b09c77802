package graft.core

import org.apache.spark.sql.SparkSession

/** Session builders with the engine's execution defaults.
  *
  * `local(n)` — test/verify harness: n threads, matching shuffle fan-out.
  * `clusterDefaults` — the conf a 100 TB deployment starts from: AQE with
  * skew-join handling (hot entity keys — the reference's generator gives
  * the top-200 cards 40% of fraud), partition coalescing, 128 MB scan
  * splits, and the RocksDB state store for streaming state that exceeds
  * heap (the 24 h per-key buffers at full stream rate).
  */
object GraftSession {

  def local(threads: Int = 32, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$threads]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Conf pairs for cluster submission (spark-submit --conf). */
  val clusterDefaults: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString,
    "spark.sql.parquet.filterPushdown" -> "true",
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
    "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer")
}
