package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{AvroCodec, Timestamps}
import graft.pipeline.Multimodal
import graft.model.TransactionEvent

/** Sources layer: Avro roundtrip + v1->v2 schema evolution, timestamp
  * extraction, multimodal frame sampling, typed event contracts. */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("avro roundtrip and v1->v2 reader-schema evolution fills defaults") {
    val v1 = AvroCodec.parse(AvroCodec.txnV1Json)
    val v2 = AvroCodec.parse(AvroCodec.txnV2Json)
    val bytes = AvroCodec.encode(v1, Map(
      "txn_id" -> "t1", "card_id" -> "c1", "amount" -> 42.5,
      "currency" -> "EUR", "mcc" -> "6011", "geo_country" -> "US",
      "timestamp" -> 1704067200000L, "is_fraud" -> true))
    // same-schema roundtrip
    val r1 = AvroCodec.decode(v1, v1, bytes)
    assert(r1.get("txn_id").toString == "t1" &&
      r1.get("amount") == 42.5 && r1.get("is_fraud") == true)
    // evolution: v1 bytes read with v2 reader -> defaults materialize
    val r2 = AvroCodec.decode(v1, v2, bytes)
    assert(r2.get("merchant_id") == null && r2.get("risk_score") == 0.0)
    assert(r2.get("currency").toString == "EUR")
  }

  test("avro encode of decoded record is stable (deterministic bytes)") {
    val v1 = AvroCodec.parse(AvroCodec.txnV1Json)
    val fields = Map[String, Any]("txn_id" -> "t2", "card_id" -> "c2",
      "amount" -> 1.0, "currency" -> "USD", "mcc" -> "5411",
      "geo_country" -> null, "timestamp" -> 0L, "is_fraud" -> false)
    val a = AvroCodec.encode(v1, fields)
    val b = AvroCodec.encode(v1, fields)
    assert(java.util.Arrays.equals(a, b))
  }

  test("timestamp extraction: iso strings, unix seconds, unix millis, fallback") {
    val df = Seq("2024-01-01 00:00:00", "1704067200", "1704067200000", "junk")
      .toDF("raw")
      .withColumn("ts", Timestamps.extract($"raw"))
    val out = df.select(unix_millis($"ts")).as[Long].collect()
    assert(out(0) == 1704067200000L)
    assert(out(1) == 1704067200000L)
    assert(out(2) == 1704067200000L)
    assert(out(3) > 1704067200000L) // fell back to processing time
  }

  test("multimodal frame sampling slices payloads deterministically") {
    val media = Multimodal.fromDocuments(spark,
      graft.core.Tables.documents(spark, sf0001)).limit(3)
    val frames = Multimodal.frameSample(media, frameBytes = 100, everyK = 2)
    val byDoc = frames.groupBy($"media_id").count().collect()
    assert(byDoc.nonEmpty)
    // every sampled frame index is even
    assert(frames.filter($"frame_idx" % 2 =!= 0).count() == 0)
  }

  test("wav synth->decode roundtrip recovers rate, length, and samples") {
    import spark.implicits._
    val ids = spark.range(0, 8).toDF("doc_id")
    val decoded = Multimodal.decodeAudio(Multimodal.synthAudioTable(spark, ids))
      .collect().sortBy(_.media_id)
    assert(decoded.length == 8)
    decoded.foreach { d =>
      val id = d.media_id
      assert(d.sample_rate == 8000 + (id % 4) * 4000)
      assert(d.n_samples == 400 + id % 100)
      assert(d.duration_us == d.n_samples * 1000000L / d.sample_rate)
      // closed-form fold from the generator's sample formula
      val expect = (0L until d.n_samples).map { i =>
        (i + 1) * (((31 * i * i + 7 * i + 13 * id) % 65536) - 32768)
      }.sum
      assert(d.amp_sum == expect)
    }
  }

  test("avi synth->decode roundtrip recovers dims, frames, timing, pixels") {
    import spark.implicits._
    val ids = spark.range(0, 8).toDF("doc_id")
    val decoded = Multimodal.decodeVideo(Multimodal.synthVideoTable(spark, ids))
      .collect().sortBy(_.media_id)
    assert(decoded.length == 8)
    decoded.foreach { d =>
      val id = d.media_id
      val (w, h, nf, fps) = (8 + id % 5, 6 + id % 7, 3 + id % 4, 10 + id % 5)
      assert(d.width == w && d.height == h && d.n_frames == nf)
      assert(d.usec_per_frame == 1000000L / fps)
      // closed-form fold from the generator's pixel formula (top-down
      // raster per frame — the decoder must undo the DIB row flip)
      var expect = 0L
      for (f <- 0L until nf; y <- 0L until h; x <- 0L until w)
        expect += ((f * h + y) * w + x + 1) *
          (((x + y + f + 3 * id) % 256) * 65536 +
           ((2 * x + 3 * y + 7 * f + 2 * id) % 256) * 256 +
           ((5 * x + 11 * y + 17 * f + id) % 256))
      assert(d.pix_sum == expect)
    }
  }

  test("mjpeg synth->decode roundtrip is bit-exact through a real JPEG codec") {
    import spark.implicits._
    val ids = spark.range(0, 8).toDF("doc_id")
    val decoded = Multimodal.decodeMjpegVideo(
        Multimodal.synthMjpegTable(spark, ids))
      .collect().sortBy(_.media_id)
    assert(decoded.length == 8)
    decoded.foreach { d =>
      val id = d.media_id
      val (w, h, nf, fps) = (10 + id % 9, 9 + id % 8, 2 + id % 3, 10 + id % 5)
      assert(d.width == w && d.height == h && d.n_frames == nf)
      assert(d.usec_per_frame == 1000000L / fps)
      // closed-form fold from the block-gray formula: only holds if the
      // lossy encode->decode roundtripped every pixel bit-exactly
      var expect = 0L
      for (f <- 0L until nf; y <- 0L until h; x <- 0L until w) {
        val c = (7 * (x / 8) + 13 * (y / 8) + 17 * f + 29 * id) % 256
        expect += ((f * h + y) * w + x + 1) * (c * 65536 + c * 256 + c)
      }
      assert(d.pix_sum == expect)
    }
  }

  test("bpe merge training follows the hand-computed greedy trajectory") {
    import spark.implicits._
    // corpus: "aaaa" x2, "ab" x1 — exercises the equal-symbol-run parity
    // (aaaa merges at positions 0 and 2, not 0 and 1), the lexicographic
    // tie-break ((aa,</w>) beats (aa,aa) at equal count because '<'<'a'),
    // and early exhaustion (pairs run out after 5 of the 8 rounds)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_spec_")
    Seq((0L, "aaaa aaaa ab", "en", "spec", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_bpe_merges")(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "a", "a", "aa", 6L),
      (2L, "aa", "</w>", "aa</w>", 2L),
      (3L, "aa", "aa</w>", "aaaa</w>", 2L),
      (4L, "a", "b", "ab", 1L),
      (5L, "ab", "</w>", "ab</w>", 1L)))
  }

  test("bpe encode applies the trained merges to every distinct word") {
    import spark.implicits._
    // same corpus as the merges spec: both words collapse to a single
    // symbol once all five reachable merges apply
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_enc_spec_")
    Seq((0L, "aaaa aaaa ab", "en", "spec", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_bpe_encode")(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(got.toSeq == Seq(
      ("aaaa", 2L, 1L, "aaaa</w>"),
      ("ab", 1L, 1L, "ab</w>")))
  }

  test("transaction event model: risk domains match the reference lists") {
    assert(TransactionEvent.highRiskMcc.contains("6011"))
    assert(TransactionEvent.highRiskCountries.contains("RU"))
    val e = TransactionEvent("t", "c", "u", 1.0, "USD", "5411", "d", "ip",
      None, None, None, None, 0L, None)
    assert(!e.is_fraud && e.risk_score == 0.0 && e.merchant_id.isEmpty)
  }
}
