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

  /** REAL codec roundtrip (round-5 verdict #5): per doc_id, synthesize a
    * deterministic PNG on the executors, decode it back with the JDK's
    * `javax.imageio`, and emit true dims + the exact position-weighted
    * pixel fold. The oracle recomputes dims and fold CLOSED-FORM from the
    * generator's pixel formula — it never sees a PNG — so the check only
    * passes if the encode->decode roundtrip is lossless and the raster
    * geometry (width/height orientation, pixel order) is exactly right. */
  private def mmDecoded(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeImages(
        Multimodal.synthImageTable(spark,
          Tables.documents(spark, dir).select(col("doc_id"))))
      .toDF()
      .select(col("media_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("pixel_sum"))
      .orderBy(col("media_id"))

  private val mmDecodedSql =
    """WITH dims AS (
      |  SELECT doc_id, CAST(8 + doc_id % 5 AS BIGINT) AS w,
      |    CAST(6 + doc_id % 7 AS BIGINT) AS h
      |  FROM documents
      |), px AS (
      |  SELECT d.doc_id, d.w, d.h, x.range AS x, y.range AS y
      |  FROM dims d, range(12) x, range(12) y
      |  WHERE x.range < d.w AND y.range < d.h
      |)
      |SELECT doc_id AS media_id, w AS width, h AS height,
      |  CAST(SUM((x + w * y + 1) *
      |    (((x*7 + y*13 + doc_id) % 256) * 65536 +
      |     ((x*3 + y*5 + 2*doc_id) % 256) * 256 +
      |     ((x + y + 3*doc_id) % 256))) AS BIGINT) AS pixel_sum
      |FROM px GROUP BY doc_id, w, h
      |ORDER BY media_id""".stripMargin

  /** REAL resize stage on the decoded PNGs: nearest-neighbor 4×4
    * thumbnail (source pixel = (tx·w div 4, ty·h div 4)) over the same
    * synthesized rasters, fold position-weighted. The oracle recomputes
    * the RESAMPLED fold closed-form — decode + sample-position
    * arithmetic + raster order all checked at once. */
  private def mmResized(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resizeImages(
        Multimodal.synthImageTable(spark,
          Tables.documents(spark, dir).select(col("doc_id"))), 4, 4)
      .toDF()
      .select(col("media_id"),
        col("src_width").cast("long").as("src_width"),
        col("src_height").cast("long").as("src_height"), col("thumb_sum"))
      .orderBy(col("media_id"))

  private val mmResizedSql =
    """WITH dims AS (
      |  SELECT doc_id, CAST(8 + doc_id % 5 AS BIGINT) AS w,
      |    CAST(6 + doc_id % 7 AS BIGINT) AS h
      |  FROM documents
      |), px AS (
      |  SELECT d.doc_id, d.w, d.h, tx.range AS tx, ty.range AS ty,
      |    (tx.range * d.w) // 4 AS sx, (ty.range * d.h) // 4 AS sy
      |  FROM dims d, range(4) tx, range(4) ty
      |)
      |SELECT doc_id AS media_id, w AS src_width, h AS src_height,
      |  CAST(SUM((tx + 4 * ty + 1) *
      |    (((sx*7 + sy*13 + doc_id) % 256) * 65536 +
      |     ((sx*3 + sy*5 + 2*doc_id) % 256) * 256 +
      |     ((sx + sy + 3*doc_id) % 256))) AS BIGINT) AS thumb_sum
      |FROM px GROUP BY doc_id, w, h
      |ORDER BY media_id""".stripMargin

  /** IMAGE NEAR-DUP dedup via perceptual hash + Hamming-LSH banding
    * (round 10) — the multimodal member of the dedup family: byte-exact
    * dedup misses a re-encoded or slightly-retouched image, so the
    * pipeline hashes PERCEPTUALLY (aHash over a decode-real 8×8 luma
    * grid, [[graft.pipeline.Multimodal.phashImages]]) and joins on the
    * four 16-bit HASH BANDS — at most 3 differing bits cannot touch all
    * 4 bands (pigeonhole), so the banded equi-join is PROVABLY complete
    * for Hamming ≤ 3, and the oracle's ALL-PAIRS form checks exactly
    * that (a candidate the bands missed would fail the hash match — the
    * containment-dedup proof shape, here with a closed-form pixel
    * oracle: DuckDB never decodes a PNG, it re-derives every luma sample
    * from the generator formula, including the near-dup corpus's
    * single-pixel perturbation). Candidates are bounded by band-value
    * collisions (~1/2¹⁶ of pairs + true dups), never |images|².
    * Measured at sf0.01: 100 pairs — 43 of the 45 genuine near-dup
    * pairs (the 2 misses flip > 3 bits when the perturbation's mean
    * shift tips marginal bits; 5 further dup ids have e ≡ 9 mod 10,
    * i.e. their base image is itself a perturbed render, so they are
    * not near-dups of it by construction), plus deterministic aHash
    * band collisions among same-dim LCG-related rasters — the false
    * positives a perceptual hash honestly has, identical in both
    * engines. */
  private def mmPhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val ph = Multimodal.phashImages(
        Multimodal.synthNearDupImageTable(spark,
          Tables.documents(spark, dir).select(col("doc_id"))))
      .toDF().persist()
    val bands = ph.select(col("media_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("k", "v")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.k") === col("y.k") && col("x.v") === col("y.v") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("ma"), col("y.media_id").as("mb"))
      .distinct()
    val pa = ph.select(col("media_id").as("ma"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val pb = ph.select(col("media_id").as("mb"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    val out = cand.join(pa, Seq("ma")).join(pb, Seq("mb"))
      .withColumn("hamming", expr(
        "bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3)").cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("ma"), col("mb"), col("hamming"))
      .orderBy(col("ma"), col("mb"))
    graft.core.CachePin.sealAndRelease(out, ph)
  }

  /** CTE chain through per-doc band words (hw) + per-doc band rows
    * (bands) — shared by the batch all-pairs oracle and the streaming
    * keep-first-projection oracle. */
  private[queries] val phashHwSql =
    """WITH d2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 9 THEN doc_id // 10 ELSE doc_id END AS e,
      |    CASE WHEN doc_id % 10 = 9 THEN 1 ELSE 0 END AS pert
      |  FROM documents
      |), d3 AS (
      |  SELECT doc_id, e, pert, CAST(8 + e % 5 AS BIGINT) AS w,
      |    CAST(6 + e % 7 AS BIGINT) AS h
      |  FROM d2
      |), px AS (
      |  SELECT doc_id, e, pert, pp.range AS p,
      |    ((pp.range % 8) * w) // 8 AS sx, ((pp.range // 8) * h) // 8 AS sy
      |  FROM d3, range(64) pp
      |), lcg AS (
      |  SELECT doc_id, p, pert, sx, sy,
      |    (1103515245 * (sx + 16*sy + 256*e) + 12345) % 2147483648 AS v
      |  FROM px
      |), g AS (
      |  SELECT doc_id, p,
      |    299 * (CASE WHEN pert = 1 AND sx = 0 AND sy = 0
      |        THEN (v % 256 + 128) % 256 ELSE v % 256 END)
      |    + 587 * ((v // 256) % 256)
      |    + 114 * ((v // 65536) % 256) AS gray
      |  FROM lcg
      |), tot AS (
      |  SELECT doc_id, CAST(SUM(gray) AS BIGINT) AS total
      |  FROM g GROUP BY doc_id
      |), bits AS (
      |  SELECT g.doc_id, g.p,
      |    CASE WHEN g.gray * 64 >= t.total THEN 1 ELSE 0 END AS bit
      |  FROM g JOIN tot t ON t.doc_id = g.doc_id
      |), bands AS (
      |  SELECT doc_id, p // 16 AS k,
      |    CAST(SUM(bit * (CAST(1 AS BIGINT) << CAST(p % 16 AS INT)))
      |      AS BIGINT) AS v
      |  FROM bits GROUP BY 1, 2
      |), hw AS (
      |  SELECT doc_id,
      |    MAX(CASE WHEN k = 0 THEN v END) AS b0,
      |    MAX(CASE WHEN k = 1 THEN v END) AS b1,
      |    MAX(CASE WHEN k = 2 THEN v END) AS b2,
      |    MAX(CASE WHEN k = 3 THEN v END) AS b3
      |  FROM bands GROUP BY doc_id
      |)""".stripMargin

  private val mmPhashDedupSql =
    s"""$phashHwSql
      |SELECT a.doc_id AS ma, b.doc_id AS mb,
      |  CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
      |     + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
      |    AS BIGINT) AS hamming
      |FROM hw a JOIN hw b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
      |    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
      |ORDER BY ma, mb""".stripMargin

  /** Oracle for the streaming phash collision service: the same chain,
    * with the pair set restricted to the KEEP-FIRST projection — (a, b)
    * counted iff a owns (= is MIN poster of) some band bucket b also
    * posts, exactly what band-keyed keep-first state emits under the
    * id-ordered replay. Same exact-Hamming filter. */
  private[queries] val mmPhashStreamSql =
    s"""$phashHwSql,
      |win AS (
      |  SELECT k, v, MIN(doc_id) AS w FROM bands GROUP BY k, v
      |), pr AS (
      |  SELECT DISTINCT win.w AS ma, f.doc_id AS mb
      |  FROM bands f JOIN win ON win.k = f.k AND win.v = f.v
      |    AND win.w < f.doc_id
      |)
      |SELECT pr.ma, pr.mb,
      |  CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
      |     + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
      |    AS BIGINT) AS hamming
      |FROM pr JOIN hw a ON a.doc_id = pr.ma JOIN hw b ON b.doc_id = pr.mb
      |WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
      |    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= 3
      |ORDER BY ma, mb""".stripMargin

  /** REAL audio codec roundtrip (round-5 verdict "next" #3): per doc_id,
    * synthesize a deterministic 16-bit PCM WAV on the executors, decode
    * it back through `javax.sound.sampled` (the JDK's WAVE parser), and
    * emit header rate, true sample count, integer-derived duration, and
    * the exact position-weighted amplitude fold. The oracle recomputes
    * everything CLOSED-FORM from the generator's sample formula — it
    * never sees a WAV — so the check only passes if the encode->decode
    * roundtrip is lossless and the PCM byte order is exactly right. */
  private def mmAudio(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeAudio(
        Multimodal.synthAudioTable(spark,
          Tables.documents(spark, dir).select(col("doc_id"))))
      .toDF()
      .select(col("media_id"), col("sample_rate"), col("n_samples"),
        col("duration_us"), col("amp_sum"))
      .orderBy(col("media_id"))

  private val mmAudioSql =
    """WITH params AS (
      |  SELECT doc_id, CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS rate,
      |    CAST(400 + doc_id % 100 AS BIGINT) AS n
      |  FROM documents
      |), samples AS (
      |  SELECT p.doc_id, p.rate, p.n, i.range AS i,
      |    ((31 * i.range * i.range + 7 * i.range + 13 * p.doc_id) % 65536)
      |      - 32768 AS s
      |  FROM params p, range(500) i
      |  WHERE i.range < p.n
      |)
      |SELECT doc_id AS media_id, rate AS sample_rate, n AS n_samples,
      |  n * 1000000 // rate AS duration_us,
      |  CAST(SUM((i + 1) * s) AS BIGINT) AS amp_sum
      |FROM samples GROUP BY doc_id, rate, n
      |ORDER BY media_id""".stripMargin

  /** Audio near-dup dedup via energy-delta fingerprint + Hamming-LSH
    * banding (round 11) — the AUDIO member of the perceptual-dedup
    * family (`dedup_phash_images` is the image member, same machinery
    * shape): byte-exact dedup misses a re-mastered or lightly-edited
    * recording, so the pipeline fingerprints PERCEPTUALLY — REAL
    * javax.sound decode → 8-sample frame energies (exact Longs) → one
    * sign-of-delta bit per adjacent frame pair (the Shazam-lite
    * signature: robust to uniform gain, which scales every energy but
    * flips no comparisons), 49–61 bits packed into FOUR 16-bit BAND
    * words keyed by (band, frame count): a Hamming-≤3 pair cannot
    * differ in all 4 bands, so the banded equi-join is PROVABLY
    * complete at Hamming ≤ 3 among equal-length fingerprints (and the
    * 2¹⁶ band space keeps bucket occupancy ~n/2¹⁶ at corpus scale —
    * the first 7-bit-word cut saturated its 128 buckets, see git
    * history), and the oracle's ALL-PAIRS closed-form recompute (DuckDB
    * never parses a WAV — it re-derives every sample from the generator
    * formula, including the near-dup corpus's single-sample
    * perturbation) grades exactly that.
    * Perturbed copies (id % 10 = 9 re-renders base id div 10 with one
    * sample +1) change ONLY frame 0's energy (by 2·s₅+1 ≪ the ~8.6e9
    * frame scale), which feeds only delta bit 0 — so a true dup pair
    * sits at Hamming ≤ 1 BY CONSTRUCTION, no recall knob to tune.
    * Measured at sf0.01: exactly the 45 genuine dup pairs, all at
    * Hamming 0, ZERO collisions (the other 5 dup ids have e ≡ 9 mod 10:
    * their base is itself a perturbed render, so they are not near-dups
    * of it, same as the image corpus) — a ~56-bit signature separates a
    * 500-clip corpus cleanly, OperatorSpec pins the bit packing and the
    * only-bit-0 dup property. */
  private def mmAudioDedup(spark: SparkSession, dir: String): DataFrame = {
    val fp = Multimodal.audioFingerprint(
        Multimodal.synthNearDupAudioTable(spark,
          Tables.documents(spark, dir).select(col("doc_id"))))
      .toDF().persist()
    val bands = fp.select(col("media_id"), col("fc"),
      posexplode(array(col("w0"), col("w1"), col("w2"), col("w3")))
        .as(Seq("k", "v")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.k") === col("y.k") && col("x.fc") === col("y.fc") &&
          col("x.v") === col("y.v") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("ma"), col("y.media_id").as("mb"))
      .distinct()
    val pa = fp.select(col("media_id").as("ma"), col("w0").as("a0"),
      col("w1").as("a1"), col("w2").as("a2"), col("w3").as("a3"))
    val pb = fp.select(col("media_id").as("mb"), col("w0").as("c0"),
      col("w1").as("c1"), col("w2").as("c2"), col("w3").as("c3"))
    val out = cand.join(pa, Seq("ma")).join(pb, Seq("mb"))
      .withColumn("hamming", expr(
        "bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3)").cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("ma"), col("mb"), col("hamming"))
      .orderBy(col("ma"), col("mb"))
    graft.core.CachePin.sealAndRelease(out, fp)
  }

  private val mmAudioDedupSql =
    """WITH d2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 9 THEN doc_id // 10 ELSE doc_id END AS e,
      |    CASE WHEN doc_id % 10 = 9 THEN 1 ELSE 0 END AS pert
      |  FROM documents
      |), dim AS (
      |  SELECT doc_id, e, pert, CAST(400 + e % 100 AS BIGINT) AS n
      |  FROM d2
      |), sv AS (
      |  SELECT doc_id, n, i // 8 AS f,
      |    ((31 * i * i + 7 * i + 13 * e + 97 * e * i
      |      + CASE WHEN pert = 1 AND i = 5 THEN 1 ELSE 0 END) % 65536)
      |      - 32768 AS s
      |  FROM (SELECT doc_id, e, pert, n,
      |          CAST(unnest(range(n)) AS BIGINT) AS i FROM dim)
      |  WHERE i < (n // 8) * 8
      |), en AS (
      |  SELECT doc_id, n, f, SUM(s * s) AS ef
      |  FROM sv GROUP BY doc_id, n, f
      |), db AS (
      |  SELECT doc_id, n, f,
      |    CASE WHEN lead(ef) OVER (PARTITION BY doc_id ORDER BY f) > ef
      |      THEN 1 ELSE 0 END AS b
      |  FROM en
      |), fpx AS MATERIALIZED (
      |  SELECT doc_id, CAST(n // 8 AS BIGINT) AS fc,
      |    CAST(SUM(CASE WHEN f // 16 = 0
      |      THEN b * (1 << CAST(f % 16 AS INT)) ELSE 0 END) AS BIGINT) AS w0,
      |    CAST(SUM(CASE WHEN f // 16 = 1
      |      THEN b * (1 << CAST(f % 16 AS INT)) ELSE 0 END) AS BIGINT) AS w1,
      |    CAST(SUM(CASE WHEN f // 16 = 2
      |      THEN b * (1 << CAST(f % 16 AS INT)) ELSE 0 END) AS BIGINT) AS w2,
      |    CAST(SUM(CASE WHEN f // 16 = 3
      |      THEN b * (1 << CAST(f % 16 AS INT)) ELSE 0 END) AS BIGINT) AS w3
      |  FROM db WHERE f < n // 8 - 1
      |  GROUP BY doc_id, n
      |)
      |SELECT a.doc_id AS ma, b.doc_id AS mb,
      |  CAST(bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1))
      |     + bit_count(xor(a.w2, b.w2)) + bit_count(xor(a.w3, b.w3))
      |    AS BIGINT) AS hamming
      |FROM fpx a JOIN fpx b
      |  ON a.fc = b.fc AND a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.w0, b.w0)) + bit_count(xor(a.w1, b.w1))
      |    + bit_count(xor(a.w2, b.w2)) + bit_count(xor(a.w3, b.w3)) <= 3
      |ORDER BY ma, mb""".stripMargin

  /** VIDEO near-dup dedup via per-keyframe perceptual hashes (round 11)
    * — completes the perceptual-dedup family across all three media
    * modalities (image aHash, audio energy-delta, video keyframe-hash):
    * a re-encoded or lightly-retouched re-upload defeats byte dedup, so
    * each clip's frames hash perceptually (REAL RIFF/AVI container walk
    * → 4×4 NN luma grid → 16-bit aHash per frame,
    * [[graft.pipeline.Multimodal.videoFingerprint]]) and the FRAME INDEX
    * is the LSH band: clips in this corpus share ≥ 3 frames, and a pair
    * within total Hamming ≤ 2 cannot differ in every frame's hash, so
    * the (frame, dims, frame-count, hash) equi-join is PROVABLY complete
    * at the threshold. The oracle is the ALL-PAIRS closed form — DuckDB
    * never parses an AVI; it re-derives every sampled pixel from the
    * generator's LCG formula, including the near-dup corpus's one-pixel
    * frame-0 retouch (the gradient-vs-LCG lesson from the image corpus
    * applies verbatim: synthAviNear's Scaladoc). Measured at sf0.01:
    * EXACTLY the 45 genuine dup pairs (39 at Hamming 0, 4 at 1, 2 at 2
    * — the retouch shifts the 4×4 grid's (0,0) luma, occasionally
    * tipping a neighbor bit of frame 0's mean), zero collisions —
    * 16 bits × ≥3 frames separates pseudo-random rasters cleanly;
    * OperatorSpec pins the per-frame hash against an independent
    * recompute. */
  private def mmVideoDedup(spark: SparkSession, dir: String): DataFrame = {
    val fp = Multimodal.videoFingerprint(
        Multimodal.synthNearDupVideoTable(spark,
          Tables.documents(spark, dir).select(col("doc_id"))))
      .toDF().persist()
    val cand = fp.as("x").join(fp.as("y"),
        col("x.f") === col("y.f") && col("x.w") === col("y.w") &&
          col("x.h") === col("y.h") && col("x.nf") === col("y.nf") &&
          col("x.hash16") === col("y.hash16") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("ma"), col("y.media_id").as("mb"))
      .distinct()
    val pa = fp.select(col("media_id").as("ma"), col("f"),
      col("hash16").as("ha"))
    val pb = fp.select(col("media_id").as("mb"), col("f"),
      col("hash16").as("hb"))
    val out = cand.join(pa, Seq("ma")).join(pb, Seq("mb", "f"))
      .groupBy(col("ma"), col("mb"))
      .agg(sum(expr("bit_count(ha ^ hb)")).cast("long").as("hamming"))
      .filter(col("hamming") <= 2)
      .select(col("ma"), col("mb"), col("hamming"))
      .orderBy(col("ma"), col("mb"))
    graft.core.CachePin.sealAndRelease(out, fp)
  }

  private val mmVideoDedupSql =
    """WITH d2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 9 THEN doc_id // 10 ELSE doc_id END AS e,
      |    CASE WHEN doc_id % 10 = 9 THEN 1 ELSE 0 END AS pert
      |  FROM documents
      |), dim AS (
      |  SELECT doc_id, e, pert, CAST(8 + e % 5 AS BIGINT) AS w,
      |    CAST(6 + e % 7 AS BIGINT) AS h, CAST(3 + e % 4 AS BIGINT) AS nf
      |  FROM d2
      |), cells AS (
      |  SELECT doc_id, e, pert, w, h, nf,
      |    CAST(unnest(range(nf)) AS BIGINT) AS f
      |  FROM dim
      |), px AS (
      |  SELECT c.doc_id, c.e, c.pert, c.w, c.h, c.nf, c.f,
      |    4 * ty.range + tx.range AS p,
      |    (tx.range * c.w) // 4 AS sx, (ty.range * c.h) // 4 AS sy
      |  FROM cells c, range(4) ty, range(4) tx
      |), lum AS (
      |  SELECT doc_id, w, h, nf, f, p, pert, sx, sy,
      |    (1103515245 * (sx + 16 * sy + 256 * f + 4096 * e) + 12345)
      |      % 2147483648 AS v
      |  FROM px
      |), gr AS (
      |  SELECT doc_id, w, h, nf, f, p,
      |    299 * ((v // 65536) % 256) + 587 * ((v // 256) % 256)
      |    + 114 * (CASE WHEN pert = 1 AND f = 0 AND sx = 0 AND sy = 0
      |             THEN ((v % 256) + 128) % 256 ELSE v % 256 END) AS g
      |  FROM lum
      |), tot AS (
      |  SELECT doc_id, f, SUM(g) AS total FROM gr GROUP BY doc_id, f
      |), hp AS MATERIALIZED (
      |  SELECT gr.doc_id, gr.w, gr.h, gr.nf, gr.f,
      |    CAST(SUM(CASE WHEN gr.g * 16 >= t.total
      |      THEN 1 << CAST(gr.p AS INT) ELSE 0 END) AS BIGINT) AS hash16
      |  FROM gr JOIN tot t ON t.doc_id = gr.doc_id AND t.f = gr.f
      |  GROUP BY gr.doc_id, gr.w, gr.h, gr.nf, gr.f
      |)
      |SELECT a.doc_id AS ma, b.doc_id AS mb,
      |  CAST(SUM(bit_count(xor(a.hash16, b.hash16))) AS BIGINT) AS hamming
      |FROM hp a JOIN hp b
      |  ON a.w = b.w AND a.h = b.h AND a.nf = b.nf AND a.f = b.f
      |  AND a.doc_id < b.doc_id
      |GROUP BY ma, mb
      |HAVING SUM(bit_count(xor(a.hash16, b.hash16))) <= 2
      |ORDER BY ma, mb""".stripMargin

  /** REAL video container roundtrip (round 6): per doc_id, synthesize a
    * deterministic RIFF/AVI with uncompressed DIB frames on the
    * executors, parse it back structurally (chunk walk + avih/strh/strf
    * + bottom-up 4-byte-stride frame rows — the JDK ships no video API,
    * so the parser is spec-derived), and emit header dims/frames/timing
    * plus the exact (frame, raster)-ordered pixel fold. The oracle
    * recomputes everything CLOSED-FORM from the generator's pixel
    * formula — it never sees an AVI — so the check only passes if the
    * container geometry (row flip, stride, frame order, BGR byte order)
    * is exactly right. */
  private def mmVideo(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeVideo(
        Multimodal.synthVideoTable(spark,
          Tables.documents(spark, dir).select(col("doc_id"))))
      .toDF()
      .select(col("media_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("n_frames"),
        col("usec_per_frame"), col("pix_sum"))
      .orderBy(col("media_id"))

  private val mmVideoSql =
    """WITH params AS (
      |  SELECT doc_id, CAST(8 + doc_id % 5 AS BIGINT) AS w,
      |    CAST(6 + doc_id % 7 AS BIGINT) AS h,
      |    CAST(3 + doc_id % 4 AS BIGINT) AS nf,
      |    CAST(10 + doc_id % 5 AS BIGINT) AS fps
      |  FROM documents
      |), px AS (
      |  SELECT p.doc_id, p.w, p.h, p.nf, p.fps,
      |    f.range AS f, x.range AS x, y.range AS y
      |  FROM params p, range(6) f, range(12) x, range(12) y
      |  WHERE f.range < p.nf AND x.range < p.w AND y.range < p.h
      |)
      |SELECT doc_id AS media_id, w AS width, h AS height, nf AS n_frames,
      |  1000000 // fps AS usec_per_frame,
      |  CAST(SUM(((f * h + y) * w + x + 1) *
      |    (((x + y + f + 3*doc_id) % 256) * 65536 +
      |     ((2*x + 3*y + 7*f + 2*doc_id) % 256) * 256 +
      |     ((5*x + 11*y + 17*f + doc_id) % 256))) AS BIGINT) AS pix_sum
      |FROM px GROUP BY doc_id, w, h, nf, fps
      |ORDER BY media_id""".stripMargin

  /** REAL compressed-codec roundtrip (round-7 verdict #3): per doc_id,
    * synthesize an MJPEG AVI whose frames are genuine baseline JPEGs
    * (ImageIO encoder, quality 1.0), then decode each frame back through
    * the JDK's JPEG reader inside the RIFF walk. The frames are gray and
    * constant per 8x8 block, so the lossy codec roundtrips bit-exactly
    * (DC-only DCT under all-ones quantization tables — see
    * [[graft.pipeline.Multimodal.synthMjpegAvi]]) and the oracle can
    * recompute the fold CLOSED-FORM from the block formula — it never
    * sees a JPEG. Geometry stays fully checked: the fold weights every
    * pixel by (frame, raster) position, and block values vary with
    * block coordinates, frame and id. */
  private def mmMjpeg(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeMjpegVideo(
        Multimodal.synthMjpegTable(spark,
          Tables.documents(spark, dir).select(col("doc_id"))))
      .toDF()
      .select(col("media_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("n_frames"),
        col("usec_per_frame"), col("pix_sum"))
      .orderBy(col("media_id"))

  private val mmMjpegSql =
    """WITH params AS (
      |  SELECT doc_id, CAST(10 + doc_id % 9 AS BIGINT) AS w,
      |    CAST(9 + doc_id % 8 AS BIGINT) AS h,
      |    CAST(2 + doc_id % 3 AS BIGINT) AS nf,
      |    CAST(10 + doc_id % 5 AS BIGINT) AS fps
      |  FROM documents
      |), px AS (
      |  SELECT p.doc_id, p.w, p.h, p.nf, p.fps,
      |    f.range AS f, x.range AS x, y.range AS y,
      |    (7*(x.range//8) + 13*(y.range//8) + 17*f.range + 29*p.doc_id)
      |      % 256 AS c
      |  FROM params p, range(4) f, range(18) x, range(16) y
      |  WHERE f.range < p.nf AND x.range < p.w AND y.range < p.h
      |)
      |SELECT doc_id AS media_id, w AS width, h AS height, nf AS n_frames,
      |  1000000 // fps AS usec_per_frame,
      |  CAST(SUM(((f * h + y) * w + x + 1) * (c * 65536 + c * 256 + c))
      |    AS BIGINT) AS pix_sum
      |FROM px GROUP BY doc_id, w, h, nf, fps
      |ORDER BY media_id""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_features" -> (mmFeatures _),
    "mm_decoded_features" -> (mmDecoded _),
    "mm_resized_features" -> (mmResized _),
    "mm_decoded_audio" -> (mmAudio _),
    "mm_decoded_video" -> (mmVideo _),
    "mm_decoded_mjpeg" -> (mmMjpeg _),
    "dedup_phash_images" -> (mmPhashDedup _),
    "dedup_audio_fingerprint" -> (mmAudioDedup _),
    "dedup_video_fingerprint" -> (mmVideoDedup _))

  override def oracles: Map[String, String] = Map(
    "mm_binary_features" -> mmFeaturesSql,
    "mm_decoded_features" -> mmDecodedSql,
    "mm_resized_features" -> mmResizedSql,
    "mm_decoded_audio" -> mmAudioSql,
    "mm_decoded_video" -> mmVideoSql,
    "mm_decoded_mjpeg" -> mmMjpegSql,
    "dedup_phash_images" -> mmPhashDedupSql,
    "dedup_audio_fingerprint" -> mmAudioDedupSql,
    "dedup_video_fingerprint" -> mmVideoDedupSql)
}
