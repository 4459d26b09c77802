package graft.sources

import java.io.ByteArrayOutputStream
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

/** Avro binary encode/decode (SURVEY.md S3/S4) built directly on the Avro
  * core library (org.apache.avro, ships with Spark): the spark-avro module
  * (`from_avro`/`to_avro`) is the cluster-standard path; this codec keeps
  * the capability without the connector jar and demonstrates the reader/
  * writer-schema evolution contract (schemas/transactions v1 -> v2:
  * nullable-with-default additions are backward compatible,
  * ref schemas/validate_schemas.py:36-120, docs/DesignDoc.md:123).
  *
  * Usage inside Spark: call from `mapPartitions` so the Schema/Reader
  * objects are constructed once per partition, never per row.
  */
object AvroCodec {

  /** Minimal v1 transaction schema (mirrors the reference's contract —
    * schemas/transactions.v1.avsc — in the fields our pipelines use). */
  val txnV1Json: String =
    """{
      |"type": "record", "name": "TransactionEvent", "namespace": "graft",
      |"fields": [
      |  {"name": "txn_id", "type": "string"},
      |  {"name": "card_id", "type": "string"},
      |  {"name": "amount", "type": "double"},
      |  {"name": "currency", "type": {"type": "enum", "name": "Currency",
      |    "symbols": ["USD", "EUR", "GBP", "CAD", "AUD"]}, "default": "USD"},
      |  {"name": "mcc", "type": "string"},
      |  {"name": "geo_country", "type": ["null", "string"], "default": null},
      |  {"name": "timestamp", "type": {"type": "long",
      |    "logicalType": "timestamp-millis"}},
      |  {"name": "is_fraud", "type": "boolean", "default": false}
      |]}""".stripMargin

  /** v2: adds nullable merchant fields + defaulted risk_score — decoding
    * v1 bytes with this reader schema fills the defaults. */
  val txnV2Json: String =
    """{
      |"type": "record", "name": "TransactionEvent", "namespace": "graft",
      |"fields": [
      |  {"name": "txn_id", "type": "string"},
      |  {"name": "card_id", "type": "string"},
      |  {"name": "amount", "type": "double"},
      |  {"name": "currency", "type": {"type": "enum", "name": "Currency",
      |    "symbols": ["USD", "EUR", "GBP", "CAD", "AUD", "JPY", "CHF"]},
      |    "default": "USD"},
      |  {"name": "mcc", "type": "string"},
      |  {"name": "geo_country", "type": ["null", "string"], "default": null},
      |  {"name": "timestamp", "type": {"type": "long",
      |    "logicalType": "timestamp-millis"}},
      |  {"name": "is_fraud", "type": "boolean", "default": false},
      |  {"name": "merchant_id", "type": ["null", "string"], "default": null},
      |  {"name": "merchant_name", "type": ["null", "string"], "default": null},
      |  {"name": "risk_score", "type": "double", "default": 0.0}
      |]}""".stripMargin

  def parse(json: String): Schema = new Schema.Parser().parse(json)

  /** Encode one record (field map) to Avro binary. */
  def encode(schema: Schema, fields: Map[String, Any]): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    fields.foreach { case (k, v) =>
      val f = schema.getField(k)
      val value = (f.schema().getType, v) match {
        case (Schema.Type.ENUM, s: String) =>
          new GenericData.EnumSymbol(f.schema(), s)
        case _ => v
      }
      rec.put(k, value)
    }
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** Decode Avro binary with separate writer/reader schemas (evolution). */
  def decode(writer: Schema, reader: Schema, bytes: Array[Byte]): GenericRecord =
    new GenericDatumReader[GenericRecord](writer, reader)
      .read(null, DecoderFactory.get().binaryDecoder(bytes, null))
}
