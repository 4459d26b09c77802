package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.pipeline.Multimodal

/** Multimodal binary-column pipeline under the oracle gate: documents ->
  * binary payloads -> per-partition decode(stub) -> features. The oracle
  * recomputes the deterministic pseudo-features from the text bytes, so
  * the typed mapPartitions plumbing (schema, encoders, batch iteration)
  * is what's actually being checked. */
object MultimodalQueries extends QueryModule {

  private def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeStub(
        Multimodal.fromDocuments(spark, Tables.documents(spark, dir)))
      .toDF()
      .select(col("media_id"), col("n_bytes"), col("checksum"), col("n_frames"))
      .orderBy(col("media_id"))

  private val mmFeaturesSql =
    """SELECT doc_id AS media_id,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, length(text) + 1),
      |      i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) AS checksum,
      |  (octet_length(CAST(text AS BLOB)) + 255) // 256 AS n_frames
      |FROM documents ORDER BY media_id""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_features" -> (mmFeatures _))

  override def oracles: Map[String, String] = Map(
    "mm_binary_features" -> mmFeaturesSql)
}
