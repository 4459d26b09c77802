package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Deserialize-and-split: parse a JSON payload column against a schema and
  * route rows that fail to a dead-letter branch (SURVEY.md S5; the
  * reference counts deserialization failures and destines them for
  * `*.dlq` topics — streaming/flink/feature_job.py:72-105 — but leaves the
  * side output as a TODO at :105; here the split is real).
  *
  * Single-pass: `from_json` yields null on corrupt input (PERMISSIVE), so
  * both branches are cheap filters over one parsed column — no second
  * parse, no shuffle. Works identically on batch and streaming frames;
  * in production the dlq branch writes to its own sink with the error
  * context attached.
  */
object DlqSplit {

  /** @return (valid, dlq): valid rows carry the parsed struct in
    *         `parsedCol`; dlq rows carry the raw payload + error tag.
    *
    * PERMISSIVE `from_json` never yields a null struct — malformed input
    * parses to an all-null row — so corruption is detected via the
    * columnNameOfCorruptRecord option: non-null corrupt record = DLQ. */
  def split(df: DataFrame, payload: Column, schema: StructType,
            parsedCol: String = "parsed"): (DataFrame, DataFrame) = {
    val corrupt = "_corrupt_record"
    val schemaC = schema.add(corrupt, org.apache.spark.sql.types.StringType)
    val parsed = df.withColumn(parsedCol,
      from_json(payload, schemaC, Map("columnNameOfCorruptRecord" -> corrupt)))
    // a NULL payload parses to a null struct (no corrupt record), but it is
    // still undecodable input -> dead-letter, not a phantom all-null event
    val isBad = payload.isNull || col(s"$parsedCol.$corrupt").isNotNull
    val valid = parsed.filter(!isBad)
      .withColumn(parsedCol, col(parsedCol).dropFields(corrupt))
    val dlq = parsed.filter(isBad)
      .drop(parsedCol)
      .withColumn("dlq_reason", lit("deserialization_error"))
      .withColumn("dlq_payload", payload)
    (valid, dlq)
  }
}
