package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.KafkaConfig
import graft.store.{DeltaSwap, FeatureView, Registry}

/** Jar-arrival readiness (round-6 verdict #7). Kafka and Delta jars are
  * absent from this container, so their surfaces live as option maps
  * (KafkaConfig) and generated SQL (DeltaSwap). This spec makes the swap
  * turn-key: the jar-free half pins the generated artifacts and documents
  * the container state; the `assume`-gated half runs the REAL integration
  * (Kafka source schema, Delta MERGE replaying StoreSpec's upsert
  * scenario) and is skipped-as-canceled here, live the moment the jars
  * appear on the classpath — no code change needed.
  */
class JarReadinessSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ------------------------------------------------------------- jar-free

  test("container state is what the stand-ins assume (jars absent here)") {
    // Not an assertion that jars NEVER appear — the gated tests below
    // activate when they do. This documents why they show as canceled.
    info(s"kafka jar present: ${KafkaConfig.jarPresent}")
    info(s"delta jar present: ${DeltaSwap.jarPresent}")
  }

  test("kafka: format('kafka') without the jar fails as DATA_SOURCE_NOT_FOUND") {
    assume(!KafkaConfig.jarPresent)
    val e = intercept[Exception] {
      spark.readStream.format("kafka")
        .options(KafkaConfig.source("broker:9092", Seq("txn.events")))
        .load()
    }
    assert(e.getMessage.contains("kafka"))
  }

  test("delta: generated MERGE carries the store's exact winner ordering") {
    val view = Registry.transactionFeatures
    val sql = DeltaSwap.mergeSql(view, "online_txn", "batch_src")
    assert(sql.contains("MERGE INTO online_txn t"))
    assert(sql.contains("ON t.card_id = s.card_id"))
    assert(sql.contains("s.feature_timestamp > t.feature_timestamp"))
    assert(sql.contains(
      "s.feature_timestamp = t.feature_timestamp AND s._batch_seq >= t._batch_seq"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT *"))
    // multi-entity views AND the key predicates together
    val multi = DeltaSwap.mergeSql(Registry.userDeviceFeatures, "t1", "s1")
    assert(multi.contains("t.user_id = s.user_id AND t.device_id = s.device_id"))
  }

  test("delta: dedupeBatch resolves in-batch ties like OnlineStore does") {
    val view = FeatureView("jr_view", Seq(Registry.user), ttlMs = 1000L,
      schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType))))
    val batch = Seq((1L, 100L, 1.0), (1L, 200L, 2.0), (2L, 50L, 3.0))
      .toDF("user_id", "feature_timestamp", "v")
    val out = DeltaSwap.dedupeBatch(view, batch, 7L)
      .select($"user_id", $"v", $"_batch_seq").as[(Long, Double, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2.0, 7L), (2L, 3.0, 7L)))
  }

  test("delta: DDL/TTL/VACUUM statements are well-formed") {
    val view = Registry.deviceRiskFeatures
    val ddl = DeltaSwap.createTableSql(view, "online_device")
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS online_device"))
    assert(ddl.contains("device_id BIGINT") && ddl.contains("USING delta"))
    assert(ddl.contains("risk_score DOUBLE") && ddl.contains("_batch_seq BIGINT"))
    assert(DeltaSwap.ttlSql(view, "online_device", 1000000L) ==
      s"DELETE FROM online_device WHERE feature_timestamp < ${1000000L - view.ttlMs}")
    assert(DeltaSwap.vacuumSql("online_device", 600000L) ==
      "VACUUM online_device RETAIN 0.16666666666666666 HOURS")
  }

  // --------------------------------------------- live iff jars on classpath

  test("kafka jar live: option-map read resolves with the standard schema") {
    assume(KafkaConfig.jarPresent,
      "spark-sql-kafka-0-10 not on classpath in this container")
    // Kafka's source schema is fixed; load() does not contact the broker,
    // so this validates the full option surface end-to-end jar-live.
    val df = spark.readStream.format("kafka")
      .options(KafkaConfig.source("broker:9092",
        Seq("txn.events", "click.events"), maxOffsetsPerTrigger = Some(500L)))
      .load()
    val got = df.schema.fields.map(f =>
      f.name -> f.dataType.sql.toLowerCase).toMap
    KafkaConfig.sourceSchema.foreach { case (name, tpe) =>
      assert(got.get(name).contains(tpe), s"missing/wrong $name")
    }
  }

  test("delta jar live: MERGE INTO replays the StoreSpec upsert scenario") {
    assume(DeltaSwap.jarPresent, "delta jar not on classpath in this container")
    // Delta needs its extension + catalog at session build; only reachable
    // jar-live, so the shared TestSpark session (built without them) is
    // cloned into a Delta-enabled one.
    val builder = SparkSession.builder()
      .master("local[4]").appName("graft-delta-readiness")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
    DeltaSwap.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val ds = builder.getOrCreate()
    try {
      val view = FeatureView("jr_delta_view", Seq(Registry.user), ttlMs = 1000L,
        schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.DoubleType))))
      val table = "jr_delta_online"
      ds.sql(s"DROP TABLE IF EXISTS $table")
      ds.sql(DeltaSwap.createTableSql(view, table))
      def upsert(batchId: Long, rows: Seq[(Long, Long, Double)]): Unit = {
        import ds.implicits._
        val batch = rows.toDF("user_id", "feature_timestamp", "v")
          .withColumn("computation_timestamp", col("feature_timestamp"))
        DeltaSwap.dedupeBatch(view, batch, batchId)
          .createOrReplaceTempView("jr_src")
        ds.sql(DeltaSwap.mergeSql(view, table, "jr_src"))
      }
      // the exact StoreSpec "upsert keeps latest per key" scenario + replay
      upsert(0L, Seq((1L, 100L, 1.0), (2L, 100L, 2.0)))
      upsert(1L, Seq((1L, 200L, 9.0)))
      upsert(1L, Seq((1L, 200L, 9.0))) // replayed batch: idempotent
      upsert(2L, Seq((1L, 50L, 0.5)))  // stale arrival: must not regress
      val online = ds.table(table)
        .select(col("user_id"), col("v"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(online == Map(1L -> 9.0, 2L -> 2.0))
    } finally ds.sql("DROP TABLE IF EXISTS jr_delta_online")
  }
}
