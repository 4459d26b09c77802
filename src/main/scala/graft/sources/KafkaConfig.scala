package graft.sources

/** Kafka source/sink option builders (SURVEY.md S1/S2/S6). The Kafka
  * connector jar (`spark-sql-kafka-0-10`) is not in this container, so the
  * engine cannot compile `format("kafka")` reads here — but the entire
  * option surface the reference configures (multi-topic subscribe, group
  * id, offset reset, producer batching/acks — streaming/simple/
  * stream_processor.py:89-95, generators/base_generator.py:70-80) is
  * expressed as option maps that drop directly onto
  * `spark.readStream.format("kafka").options(...)` in a deployment:
  *
  * {{{
  * spark.readStream.format("kafka")
  *   .options(KafkaConfig.source("broker:9092",
  *     Seq("txn.events", "click.events")))
  *   .load()                       // key, value binary + metadata
  * df.writeStream.format("kafka")
  *   .options(KafkaConfig.sink("broker:9092", "features.out")) ...
  * }}}
  *
  * The streaming pipelines consume any DataFrame with the same shape, so
  * swapping the file/memory source used in tests for Kafka is exactly this
  * options map plus the Avro decode (AvroCodec / from_avro).
  */
object KafkaConfig {

  /** Consumer-side options (ref stream_processor.py:89-95: multi-topic
    * subscribe, latest offsets; group id is managed by Spark's own
    * checkpointing — the checkpoint replaces Kafka group commits). */
  def source(bootstrap: String, topics: Seq[String],
             startingOffsets: String = "latest",
             maxOffsetsPerTrigger: Option[Long] = None): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> "false") ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** Producer-side options (ref base_generator.py:70-80: acks=all,
    * compression, batching — batching knobs pass through the kafka.
    * prefix). */
  def sink(bootstrap: String, topic: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "topic" -> topic,
      "kafka.acks" -> "all",
      "kafka.compression.type" -> "snappy",
      "kafka.batch.size" -> "16384",
      "kafka.linger.ms" -> "10")

  /** DLQ topic naming convention (models/config.py:56-59). */
  def dlqTopic(topic: String): String = s"$topic.dlq"

  /** True when the `spark-sql-kafka-0-10` jar is on the classpath — gates
    * the live half of JarReadinessSpec (absent in this container). */
  def jarPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  /** The fixed schema a Kafka source DataFrame carries (field -> Spark SQL
    * type). `load()` never contacts a broker to produce it, so the live
    * spec can assert the full read surface without a running Kafka. */
  val sourceSchema: Seq[(String, String)] = Seq(
    "key" -> "binary", "value" -> "binary", "topic" -> "string",
    "partition" -> "int", "offset" -> "bigint",
    "timestamp" -> "timestamp", "timestampType" -> "int")
}
