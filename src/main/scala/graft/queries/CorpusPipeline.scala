package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Corpus-preparation operators beyond cleaning/dedup — the steps between
  * a deduplicated document set and a training run: PII scrubbing,
  * mixture-weight computation with deterministic sampling, and sequence
  * packing into fixed context windows.
  *
  * Scale notes: scrubbing is per-doc (no shuffle). Mixture weights are a
  * |langs|-row aggregate broadcast back. Packing is a running sum inside
  * each lang partition (Window.partitionBy(lang)) — parallel across
  * langs; at 100 TB you sub-shard the running sum with the same
  * RangeBuckets prefix construction the KS query uses.
  */
object CorpusPipeline extends QueryModule {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", split(trim(col("text")), "\\s+"))

  // --------------------------------------------------------- PII scrubbing
  /** PII detection/redaction counts per document: email, phone-like, and
    * long-digit-run (card/account) patterns, plus an md5 fingerprint of
    * the scrubbed text proving both engines redact identically. The
    * pattern set is the standard pre-training scrub list; swap in the
    * full policy regexes in production. */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"
  private val digitRunRe = "[0-9]{9,}"

  // regex patterns go through lit(), NOT expr-string literals — Spark SQL
  // string literals treat backslash as an escape, silently mangling '\.'
  private def piiScrub(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("n_emails",
        regexp_count(col("text"), lit(emailRe)).cast("long"))
      .withColumn("n_phones",
        regexp_count(col("text"), lit(phoneRe)).cast("long"))
      .withColumn("n_digit_runs",
        regexp_count(col("text"), lit(digitRunRe)).cast("long"))
      .withColumn("scrubbed",
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>"),
          digitRunRe, "<NUM>"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"),
        col("n_digit_runs"),
        substring(md5(col("scrubbed").cast("binary")), 1, 16).as("scrub_fp"))
      .orderBy(col("doc_id"))

  private val piiScrubSql =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT) AS n_phones,
       |  CAST(len(regexp_extract_all(text, '$digitRunRe')) AS BIGINT) AS n_digit_runs,
       |  substr(md5(
       |    regexp_replace(regexp_replace(regexp_replace(text,
       |      '$emailRe', '<EMAIL>', 'g'),
       |      '$phoneRe', '<PHONE>', 'g'),
       |      '$digitRunRe', '<NUM>', 'g')), 1, 16) AS scrub_fp
       |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------- mixture weights + sampling
  /** Per-language mixture balancing: actual share vs a uniform target,
    * upsample/downsample weight, and a DETERMINISTIC content-hash sample
    * at the capped weight (md5(doc_id) % 1e6 < keep_rate * 1e6) — the
    * reproducible-across-engines/reruns form of mixture sampling. */
  private def mixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), col("lang"), size(col("toks")).cast("long").as("n_toks"))
    val tot = Window.partitionBy() // |langs| rows after the agg — tiny
    val shares = d.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("n_langs", count(lit(1)).over(tot))
      .withColumn("actual_share",
        col("n_docs") / sum(col("n_docs")).over(tot))
      .withColumn("weight", lit(1.0) / col("n_langs") / col("actual_share"))
      .withColumn("keep_rate", least(col("weight"), lit(1.0)))
    val sampled = d.join(broadcast(shares.select(col("lang"), col("keep_rate"))),
        Seq("lang"))
      .filter(
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
          16, 10).cast("long") % 1000000 <
          (col("keep_rate") * 1000000).cast("long"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
    shares.join(sampled, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        col("actual_share"), col("weight"), col("keep_rate"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      .orderBy(col("lang"))
  }

  private val mixtureWeightsSql =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    len(string_split_regex(trim(text), '\s+')) AS n_toks
      |  FROM documents
      |), shares AS (
      |  SELECT lang, count(*) AS n_docs,
      |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
      |    COUNT(*) OVER () AS n_langs,
      |    count(*) / CAST(SUM(count(*)) OVER () AS DOUBLE) AS actual_share
      |  FROM d GROUP BY lang
      |), w AS (
      |  SELECT lang, n_docs, n_tokens, actual_share,
      |    1.0 / n_langs / actual_share AS weight,
      |    LEAST(1.0 / n_langs / actual_share, 1.0) AS keep_rate
      |  FROM shares
      |), sampled AS (
      |  SELECT d.lang, count(*) AS n_sampled
      |  FROM d JOIN w ON d.lang = w.lang
      |  WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000
      |        < CAST(FLOOR(w.keep_rate * 1000000) AS BIGINT)
      |  GROUP BY d.lang)
      |SELECT w.lang, CAST(w.n_docs AS BIGINT) AS n_docs, w.n_tokens,
      |  w.actual_share, w.weight, w.keep_rate,
      |  CAST(COALESCE(s.n_sampled, 0) AS BIGINT) AS n_sampled
      |FROM w LEFT JOIN sampled s ON w.lang = s.lang
      |ORDER BY w.lang""".stripMargin

  // --------------------------------------------------- sequence packing
  /** Greedy sequence packing: concatenate each language's documents in
    * doc_id order and cut every 4096 tokens; a document's bin is where
    * its first token lands. Reports per-bin document count, token count,
    * and fill ratio — the packing-efficiency accounting of a training
    * data loader. Runs as a running sum per lang partition. */
  private val binTokens = 4096L

  private def packBins(spark: SparkSession, dir: String): DataFrame = {
    val byLang = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    val d = docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_toks"))
      .withColumn("cum", sum(col("n_toks")).over(byLang))
      .withColumn("bin", expr(s"(cum - n_toks) div $binTokens"))
    d.groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("fill_ratio", col("n_tokens") / lit(binTokens.toDouble))
      .orderBy(col("lang"), col("bin"))
  }

  private val packBinsSql =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    len(string_split_regex(trim(text), '\\s+')) AS n_toks
       |  FROM documents
       |), c AS (
       |  SELECT lang, n_toks,
       |    SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d)
       |SELECT lang, CAST((cum - n_toks) // $binTokens AS BIGINT) AS bin,
       |  count(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(SUM(n_toks) AS BIGINT) / ${binTokens.toDouble} AS fill_ratio
       |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin

  // --------------------------------------------------------- data layout
  /** Z-order (Morton curve) file layout: interleave the bits of two
    * clustering dimensions — length (n_chars, 16 bits) and a 16-bit
    * md5-derived language hash — and range-partition the curve into
    * files. Multi-dimensional clustering means a reader filtering on
    * EITHER dimension prunes most files by their min/max stats, which is
    * what Delta/Iceberg OPTIMIZE ZORDER does for table maintenance; here
    * it is the corpus-sharding pass of a training pipeline (co-locate
    * same-language, similar-length docs for packing efficiency — see
    * doc_pack_bins).
    *
    * The query emits per-file stats (doc count, char range, language
    * count): narrow ranges per file ARE the pruning-effectiveness
    * measurement. Pure integer bit arithmetic, sequential fold — exact in
    * both engines. Scale shape: one map pass + a 64-group aggregation;
    * the real write would range-partition on z — no global sort. */
  private def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("x", least(col("n_chars").cast("long"), lit(65535L)))
      .withColumn("y",
        pmod(conv(substring(md5(col("lang").cast("binary")), 1, 8), 16, 10)
          .cast("long"), lit(65536L)))
      // interleave: bit b of x -> bit 2b+1, bit b of y -> bit 2b
      .withColumn("zval", expr(
        """aggregate(sequence(0, 15), 0L, (acc, b) ->
          |  acc + shiftleft(cast(x div cast(pow(2, b) as bigint) as bigint) % 2, 2 * b + 1)
          |      + shiftleft(cast(y div cast(pow(2, b) as bigint) as bigint) % 2, 2 * b))"""
          .stripMargin))
    // equal-count range partitioning along the curve into 8 files, via
    // the two-phase distributed ranking (operators/RankedWindow — no
    // single-partition sort): ntile over (zval asc, doc_id). Only the
    // four needed columns enter the ranking (never the text bodies), and
    // sealOutput = false because the very next step reduces the per-doc
    // rows to 8 — nothing worth checkpointing.
    graft.operators.RankedWindow
      .rankDesc(d.select(col("doc_id"), col("n_chars"), col("lang"),
          col("zval")),
        (lit(0L) - col("zval")).as("negz"), col("doc_id"),
        tiles = 8, sealOutput = false)
      .withColumnRenamed("quartile", "file_id")
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).cast("long").as("min_chars"),
        max(col("n_chars")).cast("long").as("max_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("file_id"))
  }

  private val zorderLayoutSql =
    """WITH z AS (
      |  SELECT doc_id, n_chars, lang,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(16), b ->
      |      (((LEAST(CAST(n_chars AS BIGINT), 65535) // CAST(power(2, b) AS BIGINT)) % 2)
      |         * CAST(power(2, 2 * b + 1) AS BIGINT))
      |      + (((CAST(('0x' || substr(md5(lang), 1, 8)) AS BIGINT) % 65536
      |           // CAST(power(2, b) AS BIGINT)) % 2)
      |         * CAST(power(2, 2 * b) AS BIGINT)))),
      |      (acc, x) -> acc + x) AS zval
      |  FROM documents),
      |t AS (
      |  SELECT n_chars, lang,
      |    CAST(ntile(8) OVER (ORDER BY zval, doc_id) AS BIGINT) AS file_id
      |  FROM z)
      |SELECT file_id, count(*) AS n_docs,
      |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
      |  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      |FROM t GROUP BY file_id ORDER BY file_id""".stripMargin

  /** Data selection under a token budget (the quality-ranked greedy
    * knapsack every pretraining mixture runs): docs ranked per language
    * by lexical-diversity score (distinct/total tokens — an exact
    * integer ratio), cumulative token sum per language, keep while the
    * running total fits 2000 tokens. The prefix sum is a per-language
    * window (|langs| bounded partitions); at 100 TB the same selection
    * runs through the bucketed-prefix machinery the KS statistic uses
    * (RangeBuckets), ranked by score instead of value. */
  private def budgetSelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = Tables.documents(spark, dir).select($"doc_id", $"lang",
        size(split($"text", " ")).cast("long").as("n_tok"),
        size(array_distinct(split($"text", " "))).cast("long").as("n_uniq"))
      .withColumn("score", $"n_uniq".cast("double") / $"n_tok".cast("double"))
    val w = Window.partitionBy($"lang").orderBy($"score".desc, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.withColumn("cum_tok", sum($"n_tok").over(w))
      .filter($"cum_tok" <= 2000L)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("tokens_used"),
        min($"score").as("marginal_score"))
      .orderBy($"lang")
  }

  private val budgetSelectSql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, lang, n_tok,
      |    CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE) AS score
      |  FROM t),
      |c AS (
      |  SELECT doc_id, lang, n_tok, score,
      |    SUM(n_tok) OVER (PARTITION BY lang ORDER BY score DESC, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum_tok
      |  FROM s)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS tokens_used,
      |  MIN(score) AS marginal_score
      |FROM c WHERE cum_tok <= 2000
      |GROUP BY lang ORDER BY lang""".stripMargin

  // --------------------------------- DSIR importance-resampling selection
  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every source doc
    * by how much its hashed-bigram profile looks like the TARGET
    * distribution (the eval suite — doc_id % 50 = 0, the same split the
    * decontamination gates use) versus the source corpus, then select
    * the top scorers for training. Features are bigrams hashed to 64
    * buckets (the paper's hashed n-gram model, B shrunk to the corpus);
    * with add-one smoothing the importance log-weight is
    * Σ_b c_b(doc)·(log p̂_tgt(b) − log p̂_src(b)) and the repo's libm-free
    * integer log2 (`length(bin(x))`) makes the surrogate
    * Σ_b c_b·(log2i(tgt_b·S) − log2i(src_b·T)) exact in both engines
    * (S = Σ src_b, T = Σ tgt_b fold the normalizers in; a shared
    * constant per bigram count shifts all scores equally and cannot
    * reorder docs with equal n_bigrams — the surrogate's coarseness is
    * the md5 tie-broken ranking's job). Deterministic top-20 replaces
    * the paper's Gumbel resampling (exp/log sampling is not bit-exact;
    * top-k under the weight is its deterministic limit). Scale: the
    * bucket tables are 64 rows broadcast back; scoring is one map-side
    * join per doc-bucket pair — no data-sized shuffle beyond the per-doc
    * count aggregation. */
  /** The hashed-bigram bucket expression shared by the batch DSIR query
    * and the streaming gate (identical hashing is what lets the stream
    * reuse the batch oracle). */
  private[graft] val dsirBucketsExpr =
    """transform(sequence(1, size(toks) - 1),
      |  p -> pmod(cast(conv(substr(md5(cast(concat(
      |    element_at(toks, p), ' ', element_at(toks, p + 1))
      |    as binary)), 1, 8), 16, 10) as bigint), 64))""".stripMargin

  private[graft] def dsirBigrams(spark: SparkSession, dir: String)
      : DataFrame =
    docs(spark, dir)
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(dsirBucketsExpr)).as("b"))

  /** The trained model as a driver map (≤ 64 entries — bounded by the
    * bucket count, never by data): bucket → integer-log importance
    * weight, for the streaming gate's broadcast. Buckets absent from
    * either side are absent from the map, mirroring the batch query's
    * inner joins. */
  private[graft] def dsirWeights(spark: SparkSession, dir: String)
      : Map[Long, Long] = {
    val bg = dsirBigrams(spark, dir)
    val isTgt = col("doc_id") % 50 === 0
    val tgt = bg.filter(isTgt).groupBy(col("b"))
      .agg((count(lit(1)) + 1L).as("tb"))
    val src = bg.filter(!isTgt).groupBy(col("b"))
      .agg((count(lit(1)) + 1L).as("sb"))
    val t = tgt.agg(sum(col("tb"))).head().getLong(0)
    val s = src.agg(sum(col("sb"))).head().getLong(0)
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    tgt.join(src, Seq("b")).collect()
      .map(r => r.getLong(0) ->
        (bitlen(r.getLong(1) * s) - bitlen(r.getLong(2) * t)))
      .toMap
  }

  private def dsirSample(spark: SparkSession, dir: String): DataFrame = {
    val bg = dsirBigrams(spark, dir)
    val isTgt = col("doc_id") % 50 === 0
    val perDoc = bg.groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"))
    val tgt = bg.filter(isTgt).groupBy(col("b"))
      .agg((count(lit(1)) + 1L).as("tb"))
    val src = bg.filter(!isTgt).groupBy(col("b"))
      .agg((count(lit(1)) + 1L).as("sb"))
    val tsum = tgt.agg(sum(col("tb")).as("t"))
    val ssum = src.agg(sum(col("sb")).as("s"))
    val scored = perDoc.filter(!isTgt)
      .join(broadcast(tgt), Seq("b"))
      .join(broadcast(src), Seq("b"))
      .crossJoin(broadcast(tsum)).crossJoin(broadcast(ssum))
      .groupBy(col("doc_id"))
      .agg(sum(col("c") *
          (length(expr("bin(tb * s)")) - length(expr("bin(sb * t)"))))
          .cast("long").as("score"),
        sum(col("c")).as("n_bigrams"))
    scored
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("score"), col("n_bigrams"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  private[queries] val dsirSampleSql =
    """WITH t0 AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |), bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(toks)),
      |      p -> CAST(('0x' || substr(md5(toks[p] || ' ' || toks[p+1]),
      |        1, 8)) AS BIGINT) % 64)) AS b
      |  FROM t0 WHERE len(toks) >= 2
      |), pd AS (
      |  SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM bg GROUP BY 1, 2
      |), tgt AS (
      |  SELECT b, CAST(COUNT(*) + 1 AS BIGINT) AS tb FROM bg
      |  WHERE doc_id % 50 = 0 GROUP BY b
      |), src AS (
      |  SELECT b, CAST(COUNT(*) + 1 AS BIGINT) AS sb FROM bg
      |  WHERE doc_id % 50 <> 0 GROUP BY b
      |), ts AS (SELECT CAST(SUM(tb) AS BIGINT) AS t FROM tgt),
      |ss AS (SELECT CAST(SUM(sb) AS BIGINT) AS s FROM src),
      |sc AS (
      |  SELECT pd.doc_id,
      |    CAST(SUM(pd.c * (length(bin(tgt.tb * ss.s))
      |      - length(bin(src.sb * ts.t)))) AS BIGINT) AS score,
      |    CAST(SUM(pd.c) AS BIGINT) AS n_bigrams
      |  FROM pd JOIN tgt USING (b) JOIN src USING (b)
      |  CROSS JOIN ts CROSS JOIN ss
      |  WHERE pd.doc_id % 50 <> 0
      |  GROUP BY pd.doc_id
      |)
      |SELECT doc_id, score, n_bigrams FROM sc
      |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  // ------------------------------------------------------- RAG chunking
  private val chunkSize = 64L
  private val chunkStride = 48L

  /** RAG/pretraining document chunker (round 11): fixed 64-token windows
    * every 48 tokens (16-token overlap) per document — the retrieval-
    * chunking shape. Docs chunk INDEPENDENTLY, so this is a pure per-row
    * explode with zero shuffle at any corpus size; the window grid is a
    * closed all-non-negative integer formula both engines share
    * (`1 + (max(0, n−64) + 47) div 48` — operands kept ≥ 0 because
    * Spark `div` truncates while DuckDB `//` floors, and they only agree
    * on non-negatives). Output: one row per (doc, chunk) with the span
    * and an md5-derived fingerprint of the chunk text, proving both
    * engines cut byte-identical spans. */
  private def chunkWindows(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(col("n") > 0)
      .withColumn("n_chunks", expr(
        s"1L + (greatest(0L, n - $chunkSize) + ${chunkStride - 1}) div $chunkStride"))
      .withColumn("chunk_idx", explode(expr("sequence(0L, n_chunks - 1)")))
      .withColumn("start_tok", col("chunk_idx") * chunkStride)
      .withColumn("n_toks",
        least(lit(chunkSize), col("n") - col("start_tok")))
      .withColumn("chunk_text", expr(
        "concat_ws(' ', slice(toks, cast(start_tok + 1 as int), " +
          "cast(n_toks as int)))"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_toks"),
        expr("cast(conv(substr(md5(cast(chunk_text as binary)), 1, 8), " +
          "16, 10) as bigint)").as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val chunkWindowsSql =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents
       |), d AS (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
       |  FROM t WHERE len(toks) > 0
       |), g AS (
       |  SELECT doc_id, toks, n,
       |    1 + (GREATEST(0, n - $chunkSize) + ${chunkStride - 1})
       |      // $chunkStride AS n_chunks
       |  FROM d
       |), c AS (
       |  SELECT doc_id, toks, n,
       |    CAST(unnest(range(n_chunks)) AS BIGINT) AS chunk_idx
       |  FROM g
       |)
       |SELECT doc_id, chunk_idx,
       |  chunk_idx * $chunkStride AS start_tok,
       |  LEAST($chunkSize, n - chunk_idx * $chunkStride) AS n_toks,
       |  CAST(('0x' || substr(md5(array_to_string(
       |    toks[chunk_idx * $chunkStride + 1 :
       |         chunk_idx * $chunkStride +
       |         LEAST($chunkSize, n - chunk_idx * $chunkStride)], ' ')),
       |    1, 8)) AS BIGINT) AS chunk_fp
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // --------------------------------------- concat-and-chunk token packing
  private val ctxTokens = 256L

  /** GPT-style concat-and-chunk sequence packing (round 11): the per-lang
    * token stream (docs concatenated in doc_id order) split into EXACT
    * 256-token context windows. Unlike `doc_pack_bins` (doc-granular
    * bins, docs never split), documents here STRADDLE window boundaries —
    * the composition a pretraining dataloader actually sees. Prefix sums
    * give every doc its absolute token interval; each doc explodes to
    * only the windows it touches (fan-out = interval/C, Σ = total
    * tokens/C), then one window-keyed agg — no sequential scan. The
    * running sum is per-lang (parallel across langs); at 100 TB the
    * module-doc prefix-sharding note applies. Output per window: doc
    * count, first/last doc, token count (C except the final partial),
    * and the head carry-over (tokens belonging to a doc that began in an
    * earlier window — the boundary-fraction statistic). */
  private def tokenPacking(spark: SparkSession, dir: String): DataFrame = {
    val byLang = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    val d = docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
      .withColumn("cum_end", sum(col("n_toks")).over(byLang))
      .withColumn("start", col("cum_end") - col("n_toks"))
      .withColumn("first_w", expr(s"start div $ctxTokens"))
      .withColumn("last_w", expr(s"(cum_end - 1) div $ctxTokens"))
    val exploded = d
      .withColumn("w", explode(expr("sequence(first_w, last_w)")))
      .withColumn("contrib",
        least(col("cum_end"), (col("w") + 1) * ctxTokens) -
          greatest(col("start"), col("w") * ctxTokens))
      .withColumn("head_carry",
        when(col("start") < col("w") * ctxTokens,
          least(col("cum_end"), (col("w") + 1) * ctxTokens) -
            col("w") * ctxTokens).otherwise(lit(0L)))
    exploded.groupBy(col("lang"), col("w").as("window_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        sum(col("contrib")).as("n_tokens"),
        max(col("head_carry")).as("head_carry"))
      .select(col("lang"), col("window_id"), col("n_docs"),
        col("first_doc"), col("last_doc"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("head_carry").cast("long").as("head_carry"),
        (col("n_tokens").cast("double") / ctxTokens.toDouble)
          .as("fill_ratio"))
      .orderBy(col("lang"), col("window_id"))
  }

  private val tokenPackingSql =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
       |      AS n_toks
       |  FROM documents
       |), d AS (
       |  SELECT doc_id, lang, n_toks,
       |    SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
       |  FROM t WHERE n_toks > 0
       |), iv AS (
       |  SELECT doc_id, lang, n_toks,
       |    CAST(cum_end AS BIGINT) AS cum_end,
       |    CAST(cum_end - n_toks AS BIGINT) AS strt,
       |    CAST((cum_end - n_toks) // $ctxTokens AS BIGINT) AS first_w,
       |    CAST((cum_end - 1) // $ctxTokens AS BIGINT) AS last_w
       |  FROM d
       |), e AS (
       |  SELECT doc_id, lang, n_toks, cum_end, strt,
       |    CAST(unnest(range(first_w, last_w + 1)) AS BIGINT) AS w
       |  FROM iv
       |), x AS (
       |  SELECT lang, w, doc_id,
       |    LEAST(cum_end, (w + 1) * $ctxTokens)
       |      - GREATEST(strt, w * $ctxTokens) AS contrib,
       |    CASE WHEN strt < w * $ctxTokens THEN
       |      LEAST(cum_end, (w + 1) * $ctxTokens) - w * $ctxTokens
       |    ELSE 0 END AS head_carry
       |  FROM e
       |)
       |SELECT lang, w AS window_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
       |  CAST(SUM(contrib) AS BIGINT) AS n_tokens,
       |  CAST(MAX(head_carry) AS BIGINT) AS head_carry,
       |  CAST(SUM(contrib) AS BIGINT) / ${ctxTokens.toDouble} AS fill_ratio
       |FROM x GROUP BY lang, w ORDER BY lang, w""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_budget_select" -> (budgetSelect _),
    "text_chunking" -> (chunkWindows _),
    "ml_token_packing" -> (tokenPacking _),
    "corpus_dsir_sample" -> (dsirSample _),
    "doc_zorder_layout" -> (zorderLayout _),
    "text_pii_scrub" -> (piiScrub _),
    "ml_mixture_weights" -> (mixtureWeights _),
    "doc_pack_bins" -> (packBins _))

  override def oracles: Map[String, String] = Map(
    "corpus_budget_select" -> budgetSelectSql,
    "text_chunking" -> chunkWindowsSql,
    "ml_token_packing" -> tokenPackingSql,
    "corpus_dsir_sample" -> dsirSampleSql,
    "doc_zorder_layout" -> zorderLayoutSql,
    "text_pii_scrub" -> piiScrubSql,
    "ml_mixture_weights" -> mixtureWeightsSql,
    "doc_pack_bins" -> packBinsSql)
}
