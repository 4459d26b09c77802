package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Text-analysis and deduplication operators for large-scale training-data
  * pipelines over the `documents` table: token statistics, quality scoring,
  * heuristic language ID, content fingerprinting, exact dedup, n-gram
  * Jaccard near-dup, MinHash+LSH and SimHash.
  *
  * Cross-engine determinism: every hash is md5-derived (identical in Spark
  * and DuckDB), folds over arrays are explicit sequential reduces, and all
  * integer arithmetic stays in BIGINT range.
  *
  * Scale notes: all per-doc operators are embarrassingly parallel
  * (no shuffle). Near-dup candidate generation is bucketed — n-gram
  * Jaccard buckets by (lang, length band), MinHash by LSH band value — so
  * the pair join is a shuffle on the bucket key, never an all-pairs cross
  * join; that is the property that survives 100 TB. The brute-force pair
  * scoring inside a bucket is bounded by bucket size (tune bands/rows at
  * scale).
  */
object TextAnalysis extends QueryModule {

  /** tokens = whitespace split of trimmed text (documents are single-space
    * separated; \s+ for robustness). */
  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", split(trim(col("text")), "\\s+"))

  // --------------------------------------------------------- token stats
  /** Token counting per document: whitespace tokens, distinct tokens,
    * type-token ratio, average token length. */
  private def tokenStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      col("n_chars"),
      size(col("toks")).cast("long").as("n_tokens"),
      size(array_distinct(col("toks"))).cast("long").as("n_unique_tokens"),
      (size(array_distinct(col("toks"))) / size(col("toks")).cast("double"))
        .as("type_token_ratio"),
      (length(regexp_replace(col("text"), "\\s", "")) /
        size(col("toks")).cast("double")).as("avg_token_len"))
      .orderBy(col("doc_id"))

  private val tokenStatsSql =
    """SELECT doc_id, n_chars,
      |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
      |  len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_unique_tokens,
      |  len(list_distinct(string_split_regex(trim(text), '\s+')))
      |    / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS type_token_ratio,
      |  length(regexp_replace(text, '\s', '', 'g'))
      |    / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS avg_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ quality scoring
  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Quality scoring per document: length score, stopword ratio, repetition
    * (1 - type/token), composite quality score + keep flag — the classic
    * pretraining-corpus quality gate. */
  private def quality(spark: SparkSession, dir: String): DataFrame =
    qualityOn(docs(spark, dir)).orderBy(col("doc_id"))

  /** Frame-based core shared by the batch query and the streaming funnel
    * (input needs doc_id, n_chars, toks) — one expression set, so the
    * two surfaces cannot drift. */
  private[graft] def qualityOn(df: DataFrame): DataFrame =
    withQualityCols(df)
      .select(col("doc_id"), col("n_tokens"), col("stopword_ratio"),
        col("repetition"), col("length_score"), col("quality_score"),
        col("keep"))

  /** Column-appending form (keeps the input columns) so the streaming
    * funnel can stack several gates in ONE pass. */
  private[graft] def withQualityCols(df: DataFrame): DataFrame = {
    val sw = stopwords.map(s => s"'$s'").mkString(", ")
    df
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("stop_cnt",
        expr(s"size(filter(toks, t -> t in ($sw)))"))
      .withColumn("stopword_ratio", col("stop_cnt") / col("n_tokens").cast("double"))
      .withColumn("repetition", lit(1.0) -
        size(array_distinct(col("toks"))) / col("n_tokens").cast("double"))
      .withColumn("length_score", least(col("n_chars") / 500.0, lit(1.0)))
      .withColumn("quality_score",
        lit(0.4) * col("length_score") +
        lit(0.3) * (lit(1.0) - col("repetition")) +
        lit(0.3) * (lit(1.0) - col("stopword_ratio")))
      .withColumn("keep", col("quality_score") > 0.5)
  }

  private val qualitySql = {
    val sw = stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, n_chars, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents
       |), f AS (
       |  SELECT doc_id, len(toks) AS n_tokens,
       |    len(list_filter(toks, t -> t IN ($sw))) / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
       |    1.0 - len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) AS repetition,
       |    LEAST(n_chars / 500.0, 1.0) AS length_score
       |  FROM t)
       |SELECT doc_id, n_tokens, stopword_ratio, repetition, length_score,
       |  0.4 * length_score + 0.3 * (1.0 - repetition) + 0.3 * (1.0 - stopword_ratio) AS quality_score,
       |  (0.4 * length_score + 0.3 * (1.0 - repetition) + 0.3 * (1.0 - stopword_ratio)) > 0.5 AS keep
       |FROM f ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------- n-gram repetition gate
  /** Gopher-style word-n-gram repetition filters (Rae et al. 2021, Table
    * A1; replicated by RefinedWeb/Dolma): fraction of non-space
    * characters covered by the single most frequent word 2-gram, and
    * fraction covered by 3-grams that occur at least twice. The corpus
    * has no newlines, so the line-based members of the family would not
    * discriminate here; the n-gram members are the live ones. Simplified
    * vs the paper in one documented way: occurrences are counted
    * independently (no overlap discount), so the fraction can exceed 1
    * on pathological inputs — a monotone proxy that orders documents the
    * same way.
    *
    * Cross-engine determinism: all counting is integer; the top-gram
    * argmax is an explicit sequential fold with a lexicographic
    * tie-break; the only floating-point op is one final division per
    * column, identical IEEE operands in both engines.
    *
    * Scale: per-document higher-order functions only — no explode, no
    * shuffle before the final ORDER BY; the distinct-gram scoring inside
    * a doc is O(D^2) in doc grams with tiny constants, bounded by
    * document length, embarrassingly parallel at 100 TB. */
  private def repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionOn(docs(spark, dir)).orderBy(col("doc_id"))

  /** Frame-based core shared with the streaming funnel (input: doc_id,
    * text, toks). A document with <2 tokens has no 2-gram and DROPS from
    * the output (the oracle's inner join against the per-gram counts
    * does the same) — doc_id joins inherit that semantics. */
  private[graft] def repetitionOn(df: DataFrame): DataFrame =
    withRepetitionCols(df.filter(size(col("toks")) >= 2))
      .select(col("doc_id"),
        col("top2.gram").as("top_2gram"),
        col("top2.cnt").cast("long").as("top_2gram_cnt"),
        col("top_2gram_char_frac"),
        col("dup_3gram_char_frac"),
        col("keep"))

  /** Column-appending form; caller owns the >=2-token filter (the gate
    * is meaningless below it) and the final verdict expression. */
  private[graft] def withRepetitionCols(df: DataFrame): DataFrame = {
    df
      .withColumn("g2", expr(
        """CASE WHEN size(toks) >= 2 THEN
          |  transform(sequence(0, size(toks)-2),
          |    i -> concat_ws(' ', toks[i], toks[i+1]))
          |ELSE array() END""".stripMargin))
      .withColumn("g3", expr(
        """CASE WHEN size(toks) >= 3 THEN
          |  transform(sequence(0, size(toks)-3),
          |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
          |ELSE array() END""".stripMargin))
      .withColumn("nosp", length(regexp_replace(col("text"), " ", "")))
      .withColumn("top2", expr(
        """aggregate(
          |  transform(array_distinct(g2),
          |    d -> named_struct('cnt', size(filter(g2, x -> x = d)), 'gram', d)),
          |  named_struct('cnt', -1, 'gram', ''),
          |  (a, s) -> IF(s.cnt > a.cnt OR (s.cnt = a.cnt AND s.gram < a.gram), s, a))""".stripMargin))
      .withColumn("dup3_chars", expr(
        """aggregate(
          |  transform(array_distinct(g3),
          |    d -> CAST(IF(size(filter(g3, x -> x = d)) >= 2,
          |         size(filter(g3, x -> x = d)) * length(replace(d, ' ', '')),
          |         0) AS BIGINT)),
          |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin))
      .withColumn("top_2gram_char_frac",
        col("top2.cnt") * length(regexp_replace(col("top2.gram"), " ", ""))
          / col("nosp").cast("double"))
      .withColumn("dup_3gram_char_frac",
        col("dup3_chars") / col("nosp").cast("double"))
      .withColumn("keep",
        col("top_2gram_char_frac") <= 0.20 &&
          col("dup_3gram_char_frac") <= 0.10)
  }

  /** Oracle note: the obvious lambda formulation — count each distinct
    * gram with a NESTED list_filter capturing both the outer lambda var
    * and the grams column — mis-binds in DuckDB 1.0.0 (returns 0 for
    * some grams); the oracle therefore uses unnest + GROUP BY +
    * row_number, which is also the honest relational mirror. */
  private val repetitionSql =
    """WITH t AS (
      |  SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |), g2e AS (
      |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN
      |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
      |  ELSE [] END) AS gram FROM t
      |), g3e AS (
      |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 3 THEN
      |    list_transform(range(1, len(toks)-1),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |  ELSE [] END) AS gram FROM t
      |), top2 AS (
      |  SELECT doc_id, gram, cnt FROM (
      |    SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt,
      |      row_number() OVER (PARTITION BY doc_id
      |        ORDER BY count(*) DESC, gram) AS rn
      |    FROM g2e GROUP BY doc_id, gram)
      |  WHERE rn = 1
      |), dup3 AS (
      |  SELECT doc_id,
      |    CAST(SUM(cnt * length(replace(gram, ' ', ''))) AS BIGINT) AS dup3_chars
      |  FROM (SELECT doc_id, gram, count(*) AS cnt FROM g3e GROUP BY doc_id, gram)
      |  WHERE cnt >= 2 GROUP BY doc_id
      |), n AS (
      |  SELECT doc_id, length(replace(text, ' ', '')) AS nosp FROM documents
      |)
      |SELECT n.doc_id,
      |  top2.gram AS top_2gram,
      |  top2.cnt AS top_2gram_cnt,
      |  top2.cnt * length(replace(top2.gram, ' ', '')) / CAST(n.nosp AS DOUBLE)
      |    AS top_2gram_char_frac,
      |  COALESCE(dup3.dup3_chars, 0) / CAST(n.nosp AS DOUBLE) AS dup_3gram_char_frac,
      |  (top2.cnt * length(replace(top2.gram, ' ', '')) / CAST(n.nosp AS DOUBLE) <= 0.20
      |   AND COALESCE(dup3.dup3_chars, 0) / CAST(n.nosp AS DOUBLE) <= 0.10) AS keep
      |FROM n JOIN top2 USING (doc_id) LEFT JOIN dup3 USING (doc_id)
      |ORDER BY n.doc_id""".stripMargin

  // ----------------------------------------------------------- language ID
  /** Heuristic language ID by marker-token scoring (n-gram-profile family;
    * deterministic fixed-order argmax) + agreement with the labeled lang. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "die", "hash", "agg"),
    "en" -> Seq("the", "a", "is", "fast", "slow"),
    "es" -> Seq("el", "la", "de", "data", "query"),
    "fr" -> Seq("le", "la", "et", "window", "line"),
    "zh" -> Seq("de", "shi", "le", "join", "merge"))

  private def langId(spark: SparkSession, dir: String): DataFrame = {
    val scored = markers.foldLeft(docs(spark, dir)) { case (df, (lg, ws)) =>
      val list = ws.map(s => s"'$s'").mkString(", ")
      df.withColumn(s"s_$lg", expr(s"size(filter(toks, t -> t in ($list)))"))
    }
    val langs = markers.map(_._1)
    val pred = langs.foldRight(lit(langs.last)) { case (lg, acc) =>
      val isMax = langs.filter(_ != lg)
        .map(o => col(s"s_$lg") >= col(s"s_$o"))
        .reduce(_ && _)
      when(isMax, lit(lg)).otherwise(acc)
    }
    scored
      .withColumn("predicted_lang", pred)
      .withColumn("agrees", col("predicted_lang") === col("lang"))
      .select(col("doc_id"), col("lang"), col("predicted_lang"), col("agrees"))
      .orderBy(col("doc_id"))
  }

  private val langIdSql = {
    def cnt(lg: String) = {
      val list = markers.toMap.apply(lg).map(s => s"'$s'").mkString(", ")
      s"len(list_filter(toks, t -> t IN ($list)))"
    }
    val langs = markers.map(_._1)
    val pred = langs.foldRight(s"'${langs.last}'") { case (lg, acc) =>
      val cond = langs.filter(_ != lg).map(o => s"s_$lg >= s_$o").mkString(" AND ")
      s"CASE WHEN $cond THEN '$lg' ELSE $acc END"
    }
    s"""WITH t AS (
       |  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, lang,
       |    ${langs.map(lg => s"${cnt(lg)} AS s_$lg").mkString(",\n       |    ")}
       |  FROM t)
       |SELECT doc_id, lang, $pred AS predicted_lang,
       |  ($pred) = lang AS agrees
       |FROM s ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------ lang-ID confusion
  /** Confusion matrix of the n-gram language classifier against the
    * corpus ground truth (the evaluation every classifier in the
    * pipeline owes its consumers): per (actual, predicted) cell the
    * count and the row-normalized share — exact counts, one double
    * division. Composes the langId core, so classifier and evaluation
    * can never drift. */
  private def langidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cells = langId(spark, dir)
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
    cells
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("lang"))))
      .select(col("lang"), col("predicted_lang"), col("n"),
        (col("n").cast("double") / col("row_total").cast("double"))
          .as("share"))
      .orderBy(col("lang"), col("predicted_lang"))
  }

  private val langidConfusionSql =
    s"""WITH pred AS (
       |${langIdSql.stripSuffix(" ORDER BY doc_id").linesIterator
          .map("  " + _).mkString("\n")}
       |), cells AS (
       |  SELECT lang, predicted_lang, count(*) AS n
       |  FROM pred GROUP BY 1, 2)
       |SELECT lang, predicted_lang, n,
       |  CAST(n AS DOUBLE)
       |    / CAST(SUM(n) OVER (PARTITION BY lang) AS DOUBLE) AS share
       |FROM cells ORDER BY lang, predicted_lang""".stripMargin

  // --------------------------------------------------- RAKE keyphrases
  /** RAKE keyphrase extraction (Rose et al. 2010) — the stopword-
    * delimited companion to the TextRank keywords: candidate phrases are
    * maximal stopword-free runs; word score = deg(w)/freq(w) with
    * deg(w) = Σ phrase length over phrases containing w (the
    * co-occurrence degree, self included — Rose's convention) and
    * freq(w) = member occurrences; phrase score = the POSITION-ORDERED
    * sequential fold of its members' scores (the repo's small-double-
    * reduction rule — a bare SUM over doubles would tie to aggregation
    * order). Word stats are vocab-bounded and broadcast; top 20 via
    * TakeOrdered, no global sort. */
  private def rakeKeyphrases(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sw = stopwords.map(s => s"'$s'").mkString(", ")
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split(trim($"text"), "\\s+"))
        .as(Seq("pos", "tok")))
      .withColumn("is_stop", expr(s"CASE WHEN tok IN ($sw) THEN 1 ELSE 0 END"))
      .withColumn("phrase_id", sum($"is_stop").over(
        Window.partitionBy($"doc_id").orderBy($"pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val members = toks.filter($"is_stop" === 0 && $"tok" =!= "")
      .select($"doc_id", $"phrase_id", $"pos", $"tok")
    val plen = members.groupBy($"doc_id", $"phrase_id")
      .agg(count(lit(1)).as("plen"))
    val withLen = members.join(plen, Seq("doc_id", "phrase_id"))
    val wordStats = withLen.groupBy($"tok")
      .agg(count(lit(1)).as("freq"), sum($"plen").as("deg"))
      .withColumn("wscore", $"deg".cast("double") / $"freq".cast("double"))
    val phrases = withLen.join(broadcast(wordStats), Seq("tok"))
      .groupBy($"doc_id", $"phrase_id")
      .agg(
        expr("concat_ws(' ', transform(array_sort(collect_list(" +
          "struct(pos, tok))), s -> s.tok))").as("phrase"),
        expr("aggregate(transform(array_sort(collect_list(" +
          "struct(pos, wscore))), s -> s.wscore), 0D, (acc, x) -> acc + x)")
          .as("pscore"))
    phrases.groupBy($"phrase")
      .agg(count(lit(1)).as("n_occurrences"), max($"pscore").as("score"))
      .orderBy($"score".desc, $"phrase")
      .limit(20)
  }

  private val rakeKeyphrasesSql = {
    val sw = stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok,
       |    generate_subscripts(string_split_regex(trim(text), '\\s+'), 1)
       |      AS pos
       |  FROM documents
       |), flagged AS (
       |  SELECT doc_id, tok, pos,
       |    CASE WHEN tok IN ($sw) THEN 1 ELSE 0 END AS is_stop
       |  FROM toks
       |), pid AS (
       |  SELECT *, SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phrase_id
       |  FROM flagged
       |), members AS (
       |  SELECT doc_id, phrase_id, pos, tok FROM pid
       |  WHERE is_stop = 0 AND tok <> ''
       |), plen AS (
       |  SELECT doc_id, phrase_id, count(*) AS plen
       |  FROM members GROUP BY 1, 2
       |), withlen AS (
       |  SELECT m.*, p.plen FROM members m
       |  JOIN plen p USING (doc_id, phrase_id)
       |), wordstats AS (
       |  SELECT tok, count(*) AS freq, CAST(SUM(plen) AS BIGINT) AS deg,
       |    CAST(SUM(plen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS wscore
       |  FROM withlen GROUP BY tok
       |), phrases AS (
       |  SELECT w.doc_id, w.phrase_id,
       |    string_agg(w.tok, ' ' ORDER BY w.pos) AS phrase,
       |    list_reduce(list_prepend(0.0, list(ws.wscore ORDER BY w.pos)),
       |      (acc, x) -> acc + x) AS pscore
       |  FROM withlen w JOIN wordstats ws ON w.tok = ws.tok
       |  GROUP BY 1, 2)
       |SELECT phrase, count(*) AS n_occurrences, max(pscore) AS score
       |FROM phrases GROUP BY phrase
       |ORDER BY score DESC, phrase LIMIT 20""".stripMargin
  }

  // ------------------------------------------------------ Zipf octaves
  /** Zipf frequency-octave profile of the token distribution — the
    * log-log diagnostic a corpus curator reads before trusting quality
    * gates: octave = bit-length of a token's corpus frequency
    * (`length(bin(freq))`, the repo's libm-free integer log2), and per
    * octave the distinct-token count, total occurrences, and corpus
    * share (one double division). A Zipf-shaped corpus decays ~linearly
    * in log-count across octaves; a bot-inflated or deduplicated-badly
    * corpus doesn't. Two shuffles (token counts, then the
    * octave-domain-bounded rollup), output ≤ 64 rows at any scale. */
  private def zipfOctaves(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val freq = docs(spark, dir)
      .select(explode($"toks").as("tok")).filter($"tok" =!= "")
      .groupBy($"tok").agg(count(lit(1)).as("freq"))
    val oct = freq
      .groupBy(length(expr("bin(freq)")).cast("long").as("octave"))
      .agg(count(lit(1)).as("n_tokens"), sum($"freq").as("total_freq"))
    val tot = oct.agg(sum($"total_freq").as("corpus_tokens"))
    oct.crossJoin(broadcast(tot))
      .select($"octave", $"n_tokens", $"total_freq",
        ($"total_freq".cast("double") / $"corpus_tokens".cast("double"))
          .as("share"))
      .orderBy($"octave")
  }

  private val zipfOctavesSql =
    """WITH toks AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents
      |), freq AS (
      |  SELECT tok, count(*) AS freq FROM toks WHERE tok <> ''
      |  GROUP BY tok
      |), oct AS (
      |  SELECT CAST(length(bin(freq)) AS BIGINT) AS octave,
      |    count(*) AS n_tokens, CAST(SUM(freq) AS BIGINT) AS total_freq
      |  FROM freq GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(total_freq) AS BIGINT) AS corpus_tokens FROM oct)
      |SELECT octave, n_tokens, total_freq,
      |  CAST(total_freq AS DOUBLE) / CAST(corpus_tokens AS DOUBLE) AS share
      |FROM oct CROSS JOIN tot ORDER BY octave""".stripMargin

  // --------------------------------------------------------- fingerprinting
  /** Document fingerprinting: md5 content fingerprint + order-sensitive
    * rolling polynomial hash over md5-derived token ints (mod 1e9+7). */
  private def fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      substring(md5(col("text").cast("binary")), 1, 16).as("md5_fp"),
      expr("""aggregate(
        transform(toks, t -> cast(conv(substr(md5(cast(t as binary)), 1, 8), 16, 10) as bigint)),
        0L, (acc, x) -> (acc * 31 + x) % 1000000007)""").as("rolling_fp"))
      .orderBy(col("doc_id"))

  private val fingerprintSql =
    """SELECT doc_id,
      |  substr(md5(text), 1, 16) AS md5_fp,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split_regex(trim(text), '\s+'),
      |      t -> CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ winnowing fingerprints
  /** MOSS winnowing (Schleimer et al. 2003): LOCAL document fingerprints
    * — the positional complement to `text_fingerprint`'s whole-document
    * hashes. Each position's 4-token gram hashes to 32 bits; every
    * window of w = 4 consecutive grams contributes its MINIMUM hash
    * (ties to the RIGHTMOST position — the paper's rule, encoded by
    * key = h·1024 + (1023 − p) so one integer MIN decides both), and the
    * distinct selected (hash, position) pairs are the fingerprint set.
    * Guarantee: any shared token run of ≥ w + k − 1 = 7 tokens shares a
    * fingerprint — the local-similarity detection whole-doc hashing
    * structurally misses. Position radix 1024 bounds docs at 1023 grams
    * (this corpus: ≤ 60); longer docs widen the radix.
    *
    * Whole computation is PER-ROW array expressions (grams, keys,
    * window minima via transform+slice) — zero shuffle, pure codegen,
    * which is also why the streaming twin is a stateless map. The
    * oracle takes the rows+window form instead (a nested
    * slice-under-lambda is the DuckDB mis-bind shape; results agree,
    * plans differ by engine). */
  private[graft] def winnowCols(df: DataFrame): DataFrame =
    df.filter(size(col("toks")) >= 4)
      .withColumn("gh", expr(
        """transform(sequence(1, size(toks) - 3),
          |  i -> cast(conv(substr(md5(cast(concat_ws(' ',
          |    element_at(toks, i), element_at(toks, i + 1),
          |    element_at(toks, i + 2), element_at(toks, i + 3))
          |    as binary)), 1, 8), 16, 10) as bigint))""".stripMargin))
      .withColumn("keys",
        expr("transform(gh, (x, i) -> x * 1024 + (1022 - i))"))
      .withColumn("fps", expr(
        """CASE WHEN size(keys) >= 4 THEN
          |  array_distinct(transform(sequence(1, size(keys) - 3),
          |    s -> array_min(slice(keys, s, 4))))
          |ELSE array() END""".stripMargin))

  private def winnowing(spark: SparkSession, dir: String): DataFrame =
    winnowCols(docs(spark, dir))
      .select(col("doc_id"), size(col("gh")).cast("long").as("n_grams"),
        size(col("fps")).cast("long").as("n_fingerprints"),
        (size(col("fps")).cast("double") / size(col("gh"))).as("density"))
      .orderBy(col("doc_id"))

  private[graft] val winnowingSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), g AS (
      |  SELECT doc_id, len(toks) - 3 AS m,
      |    unnest(list_transform(range(1, len(toks) - 2),
      |      p -> {'p': p,
      |            'key': CAST(('0x' || substr(md5(toks[p] || ' ' ||
      |                toks[p+1] || ' ' || toks[p+2] || ' ' || toks[p+3]),
      |                1, 8)) AS BIGINT) * 1024 + (1023 - p)})) AS s
      |  FROM t WHERE len(toks) >= 4
      |), k AS (
      |  SELECT doc_id, m, s.p AS p, s.key AS key FROM g
      |), w AS (
      |  SELECT doc_id, p, m,
      |    MIN(key) OVER (PARTITION BY doc_id ORDER BY p
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |  FROM k
      |), f AS (
      |  SELECT DISTINCT doc_id, fp FROM w WHERE p <= m - 3
      |), s AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fingerprints
      |  FROM f GROUP BY doc_id
      |), d AS (
      |  SELECT doc_id, CAST(len(toks) - 3 AS BIGINT) AS n_grams
      |  FROM t WHERE len(toks) >= 4
      |)
      |SELECT d.doc_id, d.n_grams,
      |  COALESCE(s.n_fingerprints, 0) AS n_fingerprints,
      |  CAST(COALESCE(s.n_fingerprints, 0) AS DOUBLE) / d.n_grams AS density
      |FROM d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id""".stripMargin

  /** Streaming twin of [[winnowing]]: the per-row array computation is a
    * stateless map, so the stream form is the batch expression over the
    * doc replay — no shuffle, no state; same oracle. */
  private def winnowingStream(spark: SparkSession, dir: String,
      nChunks: Int = graft.streaming.StreamingPipelines.GateReplayChunks)
      : DataFrame = {
    import graft.streaming.StreamingPipelines
    val in = winnowCols(
      StreamingPipelines.docStreamReplay(spark, dir, nChunks)
        .select(col("doc_id"), col("text"))
        .withColumn("toks", split(trim(col("text")), "\\s+")))
      .select(col("doc_id"), size(col("gh")).cast("long").as("n_grams"),
        size(col("fps")).cast("long").as("n_fingerprints"),
        (size(col("fps")).cast("double") / size(col("gh"))).as("density"))
    StreamingPipelines.runToMemory(spark, in, "append", "winnow")
      .orderBy(col("doc_id"))
  }

  /** Cross-document winnowing-fingerprint pairs: docs sharing selected
    * hashes (positions stripped — offset-shifted copies still match, the
    * winnowing point). Candidates come from the equi-join ON THE
    * FINGERPRINT VALUE — bucketed like every near-dup candidate
    * generator here, never all-pairs; fingerprints are a ~1/w sample of
    * gram space, so the join input is w× smaller than a full gram join.
    * Top 20 directed by (shared desc, ids); share_a = shared / |A's
    * distinct hashes| is the one closing division. */
  private def winnowingPairs(spark: SparkSession, dir: String): DataFrame = {
    val fh = winnowCols(docs(spark, dir))
      .select(col("doc_id"),
        explode(expr("array_distinct(transform(fps, f -> f div 1024))"))
          .as("h"))
    val nh = fh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_h"))
    fh.select(col("h"), col("doc_id").as("doc_a"))
      .join(fh.select(col("h"), col("doc_id").as("doc_b")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(nh.select(col("doc_id").as("doc_a"), col("n_h")), Seq("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared").cast("double") / col("n_h")).as("share_a"))
      .orderBy(col("shared").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  private val winnowingPairsSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), g AS (
      |  SELECT doc_id, len(toks) - 3 AS m,
      |    unnest(list_transform(range(1, len(toks) - 2),
      |      p -> {'p': p,
      |            'key': CAST(('0x' || substr(md5(toks[p] || ' ' ||
      |                toks[p+1] || ' ' || toks[p+2] || ' ' || toks[p+3]),
      |                1, 8)) AS BIGINT) * 1024 + (1023 - p)})) AS s
      |  FROM t WHERE len(toks) >= 4
      |), k AS (
      |  SELECT doc_id, m, s.p AS p, s.key AS key FROM g
      |), w AS (
      |  SELECT doc_id, p, m,
      |    MIN(key) OVER (PARTITION BY doc_id ORDER BY p
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |  FROM k
      |), fh AS (
      |  SELECT DISTINCT doc_id, fp // 1024 AS h FROM w WHERE p <= m - 3
      |), nh AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_h FROM fh GROUP BY doc_id
      |), pr AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(COUNT(*) AS BIGINT) AS shared
      |  FROM fh a JOIN fh b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |)
      |SELECT pr.doc_a, pr.doc_b, pr.shared,
      |  CAST(pr.shared AS DOUBLE) / nh.n_h AS share_a
      |FROM pr JOIN nh ON nh.doc_id = pr.doc_a
      |ORDER BY pr.shared DESC, pr.doc_a, pr.doc_b LIMIT 20""".stripMargin

  /** STATEFUL streaming twin of [[winnowingPairs]] (round 10) — the MOSS
    * collision-SERVICE shape: each arriving doc posts its distinct
    * selected hashes into fingerprint-keyed keep-first state
    * (`bucketFirstUpdate` reused with the hash as the bucket key, the
    * third reuse of that state op after MinHash dedup and the fused
    * funnel); a post into a bucket already owned by an earlier doc IS
    * the collision, emitted at arrival. With the doc-id-ordered replay
    * the bucket owner is the GLOBAL min doc per hash, so the emitted
    * pair set is the keep-first projection of the batch pair query —
    * (a, b) counted iff a is the hash's FIRST poster (the service
    * semantics: later submissions match against the corpus owner, and
    * owner-vs-owner similarity is the batch query's job). Shared-count
    * rollup per pair + the one closing division by A's fingerprint
    * count; state is one winner id per distinct fingerprint hash — the
    * same O(buckets) shape as the MinHash dedup state, ~1/w of gram
    * space. */
  private def winnowingPairsStream(spark: SparkSession, dir: String)
      : DataFrame = {
    import graft.streaming.{StatefulFeatures, StreamingPipelines}
    import spark.implicits._
    // 2-chunk replay (round 14, the StatefulReplayChunks argument): the
    // state here is one winner per distinct fingerprint hash — the
    // LARGEST state of the keep-first family (~|corpus|·fps/w buckets) —
    // so each extra micro-batch commits an outsized store; keep-first
    // over the id-ordered replay is chunk-invariant (owner = global min
    // poster) and 2 batches still exercise the cross-batch collision.
    val fh = winnowCols(
        StreamingPipelines.spread(
            StreamingPipelines.docStreamReplay(spark, dir, nChunks = 2)
              .select(col("doc_id"), col("text")), "doc_id")
          .withColumn("toks", split(trim(col("text")), "\\s+")))
      .select(col("doc_id"),
        explode(expr("array_distinct(transform(fps, f -> f div 1024))"))
          .as("h"))
      .select(col("h").cast("string").as("band_val"), col("doc_id"))
      .as[StatefulFeatures.BandIn]
    val sink = StreamingPipelines.runToMemory(spark,
      StatefulFeatures.bucketFirstUpdate(fh).toDF(), "update", "winnowpairs")
    val nh = winnowCols(docs(spark, dir))
      .select(col("doc_id"),
        expr("size(array_distinct(transform(fps, f -> f div 1024)))")
          .cast("long").as("n_h"))
    sink.filter(col("winner_id") < col("doc_id"))
      .select(col("winner_id").as("doc_a"), col("doc_id").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(nh.select(col("doc_id").as("doc_a"), col("n_h")), Seq("doc_a"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared").cast("double") / col("n_h")).as("share_a"))
      .orderBy(col("shared").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** Oracle for the streaming pairs twin: the SAME fingerprint CTE chain
    * as the batch pair query, with the pair set restricted to the
    * keep-first projection — (a, b) counted only where a = MIN(doc_id)
    * over the hash's posters. */
  private val winnowingPairsStreamSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), g AS (
      |  SELECT doc_id, len(toks) - 3 AS m,
      |    unnest(list_transform(range(1, len(toks) - 2),
      |      p -> {'p': p,
      |            'key': CAST(('0x' || substr(md5(toks[p] || ' ' ||
      |                toks[p+1] || ' ' || toks[p+2] || ' ' || toks[p+3]),
      |                1, 8)) AS BIGINT) * 1024 + (1023 - p)})) AS s
      |  FROM t WHERE len(toks) >= 4
      |), k AS (
      |  SELECT doc_id, m, s.p AS p, s.key AS key FROM g
      |), w AS (
      |  SELECT doc_id, p, m,
      |    MIN(key) OVER (PARTITION BY doc_id ORDER BY p
      |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
      |  FROM k
      |), fh AS (
      |  SELECT DISTINCT doc_id, fp // 1024 AS h FROM w WHERE p <= m - 3
      |), win AS (
      |  SELECT h, MIN(doc_id) AS w FROM fh GROUP BY h
      |), nh AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_h FROM fh GROUP BY doc_id
      |), pr AS (
      |  SELECT win.w AS doc_a, f.doc_id AS doc_b,
      |    CAST(COUNT(*) AS BIGINT) AS shared
      |  FROM fh f JOIN win ON win.h = f.h AND win.w < f.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT pr.doc_a, pr.doc_b, pr.shared,
      |  CAST(pr.shared AS DOUBLE) / nh.n_h AS share_a
      |FROM pr JOIN nh ON nh.doc_id = pr.doc_a
      |ORDER BY pr.shared DESC, pr.doc_a, pr.doc_b LIMIT 20""".stripMargin

  // -------------------------------------------------- decontamination
  /** Train/eval decontamination — the n-gram overlap gate every LLM data
    * pipeline runs before training (the GPT-3/PaLM 13-gram recipe,
    * here 8 tokens to fit the corpus's 10-160-token docs): every 50th
    * document stands in as the held-out eval set, train docs are flagged
    * when any 8-token gram collides with an eval gram, with the earliest
    * colliding eval doc as provenance.
    *
    * Scale shape: eval grams are the SMALL side by construction (the
    * benchmark suite, not the corpus) — built once, broadcast; the train
    * side streams through a broadcast hash join on the 60-bit gram hash
    * and a per-doc rollup. No shuffle of the corpus at any point, so
    * 100 TB of train data meets a fixed-size eval set at scan speed. */
  /** (doc_id, grams): distinct 60-bit hashes of every 8-token window —
    * the decontamination fingerprint, shared verbatim by the batch gate
    * and its streaming twin so the two can never hash apart. Input needs
    * (doc_id, text). */
  /** The gram expression itself (input frame must carry `toks`) — shared
    * by [[gramRows]] and the streaming funnel's stacked stateless pass. */
  private[graft] def gramCol: Column =
    expr("""array_distinct(CASE WHEN size(toks) >= 8 THEN
      |  transform(sequence(1, size(toks) - 7),
      |    i -> cast(conv(substring(md5(cast(concat_ws(' ', slice(toks, i, 8))
      |         as binary)), 1, 15), 16, 10) as bigint))
      |ELSE array() END)""".stripMargin)

  private[graft] def gramRows(df: DataFrame): DataFrame =
    df.withColumn("toks", split(trim(col("text")), "\\s+"))
      .select(col("doc_id"), gramCol.as("grams"))

  /** The held-out suite's gram set: (gram, earliest eval doc). SMALL by
    * construction (the benchmark suite, not the corpus) — safe to
    * broadcast or driver-collect. */
  private[graft] def evalGramTable(spark: SparkSession, dir: String): DataFrame =
    gramRows(Tables.documents(spark, dir))
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("eval_doc"), explode(col("grams")).as("gram"))
      .groupBy(col("gram")).agg(min(col("eval_doc")).as("ev_src"))

  private def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val g = gramRows(Tables.documents(spark, dir))
    val evalGrams = evalGramTable(spark, dir)
    val trainDocs = g.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        col("grams"))
    val hits = trainDocs
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"), min(col("ev_src")).as("ev_min"))
    trainDocs.drop("grams").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"),
        coalesce(col("ev_min"), lit(-1L)).as("eval_src"))
      .orderBy(col("doc_id"))
  }

  private[graft] val decontaminateSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), g AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 8 THEN
      |    list_transform(range(1, len(toks) - 6),
      |      i -> CAST(('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')),
      |           1, 15)) AS BIGINT))
      |  ELSE [] END) AS grams FROM t
      |), evg AS (
      |  SELECT gram, MIN(doc_id) AS ev_src FROM (
      |    SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0)
      |  GROUP BY gram
      |), tr AS (
      |  SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 50 <> 0
      |), hits AS (
      |  SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap,
      |    MIN(evg.ev_src) AS ev_min
      |  FROM tr JOIN evg USING (gram) GROUP BY tr.doc_id
      |), td AS (
      |  SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams FROM g
      |  WHERE doc_id % 50 <> 0
      |)
      |SELECT td.doc_id, td.n_grams,
      |  COALESCE(h.n_overlap, 0) AS n_overlap,
      |  COALESCE(h.n_overlap, 0) > 0 AS contaminated,
      |  COALESCE(h.ev_min, -1) AS eval_src
      |FROM td LEFT JOIN hits h USING (doc_id) ORDER BY td.doc_id""".stripMargin

  // --------------------------------------- fuzzy (MinHash) decontamination
  /** FUZZY train/eval decontamination (round 9): the paraphrase-level
    * complement to [[decontaminate]]'s exact 8-gram gate — a train doc
    * is fuzzy-contaminated when its 3-gram shingle Jaccard against ANY
    * eval doc clears 0.5, with candidates from the SAME 4-band×2-row
    * MinHash banding as dedup_minhash_lsh (an eval-vs-train band join,
    * not all-pairs; the eval side is the benchmark suite — small by
    * construction, broadcast). Exact Jaccard is scored on the 60-bit
    * sorted-distinct shingle-hash arrays via the codegen'd two-pointer
    * intersect, and the threshold test is the INTEGER form
    * 2·inter ≥ union, so no double compare sits on the boundary.
    * Output per train doc: candidate count, best eval match + its
    * jaccard, and the flag. Scale: map-side signatures, one broadcast
    * band probe, |candidates| bounded by banding — never |train|·|eval|. */
  private def decontaminateFuzzy(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SortedIntersectCount.register(spark)
    // one md5 pass per shingle via the hexes Generate barrier (round-13,
    // verdict r12 #3): sj and mh both derive from the same digests
    val sig = hexRows(docs(spark, dir))
      .select(col("doc_id"), expr(sjFromHexesExpr).as("sj"),
        expr(mhFromHexesExpr).as("mh"))
      .persist()
    // size(sj) guard: a sub-shingle doc (<3 tokens) has null minhash slots
    // — concat_ws would skip them and collide all such docs on bands
    // '0'..'3', where the oracle's `||` yields NULL (no match). Emit none.
    val bands = sig.filter(size(col("sj")) > 0)
      .select(col("doc_id"),
        explode(expr("sequence(0, 3)")).as("b"), col("mh"))
      .select(col("doc_id"),
        concat_ws(":", col("b"),
          expr("element_at(mh, 2*b + 1)"), expr("element_at(mh, 2*b + 2)"))
          .as("band_val"))
    val cand = bands.filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(bands.filter(col("doc_id") % 50 === 0)
          .select(col("band_val"), col("doc_id").as("ev_doc"))),
        Seq("band_val"))
      .select(col("doc_id"), col("ev_doc")).distinct()
    val scored = cand
      .join(sig.select(col("doc_id"), col("sj")), Seq("doc_id"))
      .join(broadcast(sig.select(col("doc_id").as("ev_doc"),
        col("sj").as("sj_e"))), Seq("ev_doc"))
      .withColumn("inter", expr("sorted_intersect_count(sj, sj_e)"))
      .withColumn("un",
        size(col("sj")).cast("long") + size(col("sj_e")) - col("inter"))
    val best = scored
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy((col("inter").cast("double") / col("un")).desc,
            col("ev_doc"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"),
        col("ev_doc").as("best_eval"), col("inter").cast("long").as("inter"),
        col("un").as("un"),
        (col("inter") * 2 >= col("un")).as("contaminated"))
    val nc = cand.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_candidates"))
    val out = docs(spark, dir).filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"))
      .join(nc, Seq("doc_id"), "left")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("best_eval"), lit(-1L)).as("best_eval"),
        coalesce(col("inter"), lit(0L)).as("inter"),
        coalesce(col("un"), lit(0L)).as("un"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
      .orderBy(col("doc_id"))
    graft.core.CachePin.sealAndRelease(out, sig)
  }

  private[graft] val decontaminateFuzzySql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM t
      |), sig AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_sort(list_distinct(list_transform(sh,
      |      s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)))) AS sj,
      |    list_transform(range(8), j -> list_min(list_transform(sh,
      |      s -> ((2*j + 1) * CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
      |            + 97*j + 13) % 2147483647))) AS mh
      |  FROM sh
      |), bands AS MATERIALIZED (
      |  SELECT doc_id,
      |    b || ':' || mh[2*b + 1] || ':' || mh[2*b + 2] AS band_val
      |  FROM sig, (SELECT unnest(range(4)) AS b)
      |), cand AS (
      |  SELECT DISTINCT tr.doc_id, ev.doc_id AS ev_doc
      |  FROM bands tr JOIN bands ev ON tr.band_val = ev.band_val
      |  WHERE tr.doc_id % 50 <> 0 AND ev.doc_id % 50 = 0
      |), scored AS (
      |  SELECT c.doc_id, c.ev_doc,
      |    CAST(len(list_intersect(a.sj, b.sj)) AS BIGINT) AS inter,
      |    CAST(len(a.sj) + len(b.sj) - len(list_intersect(a.sj, b.sj))
      |      AS BIGINT) AS un
      |  FROM cand c JOIN sig a ON a.doc_id = c.doc_id
      |  JOIN sig b ON b.doc_id = c.ev_doc
      |), best AS (
      |  SELECT doc_id, ev_doc AS best_eval, inter, un,
      |    inter * 2 >= un AS contaminated
      |  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
      |          ORDER BY CAST(inter AS DOUBLE) / un DESC, ev_doc) AS rk
      |        FROM scored)
      |  WHERE rk = 1
      |), nc AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
      |  FROM cand GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |  COALESCE(nc.n_candidates, 0) AS n_candidates,
      |  COALESCE(b.best_eval, -1) AS best_eval,
      |  COALESCE(b.inter, 0) AS inter, COALESCE(b.un, 0) AS un,
      |  COALESCE(b.contaminated, FALSE) AS contaminated
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
      |LEFT JOIN nc USING (doc_id) LEFT JOIN best b USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** (doc_id, sj, bands) per doc — a streaming-safe PURE MAP (no explode,
    * no shuffle): the 60-bit sorted-distinct shingle hashes for exact
    * Jaccard scoring plus the 4 LSH band values off the 8-slot MinHash
    * signature. Used by the streaming fuzzy-decontamination gate. */
  /** The full-corpus (doc_id, sj, bands) signature frame — built ONCE per
    * (session, dataset) and localCheckpoint'd (round 14, the simhashFrame
    * pattern): dedup_incremental_bands and stream_dedup_incremental each
    * re-ran the identical per-shingle-md5 [[fuzzySigRows]] pass per
    * invocation (the stream additionally re-checkpointing it as the
    * static side of its stream-static probe). Pure reads of the cached
    * frame are bit-identical to the private builds they replace. */
  private val corpusSigCache =
    new scala.collection.concurrent.TrieMap[String, DataFrame]()

  private[graft] def corpusSigFrame(spark: SparkSession, dir: String)
      : DataFrame =
    corpusSigCache.getOrElseUpdate(
      s"sig:${graft.core.SessionKeys.of(spark)}@$dir",
      fuzzySigRows(docs(spark, dir).select(col("doc_id"), col("text")))
        .localCheckpoint(true))

  private[graft] def fuzzySigRows(df: DataFrame): DataFrame =
    // ONE md5 pass per shingle (round-13, verdict r12 #3: sj's 15-hex
    // and the bands' 8-hex prefixes come from the SAME digest — the old
    // two-transform form hashed every shingle twice). hexRows puts the
    // digests behind a Generate barrier; sub-shingle docs (<3 tokens,
    // empty hexes) emit sj = [] and NO bands so batch, stream, and
    // oracle agree (round-9 advice — the oracle's `||` yields NULL).
    hexRows(df).select(col("doc_id"),
      expr(sjFromHexesExpr).as("sj"),
      expr(s"if(size(hexes) > 0, $bandsFromHexesExpr, array())").as("bands"))

  // ------------------------------------------------ b-bit MinHash eval
  /** b-bit MinHash (Li & König 2010, b = 1): 64 one-bit minhashes packed
    * into two 32-bit words — an 8-BYTE sketch per document (8× smaller
    * than the 8×8-byte signature the LSH queries carry, hundreds of times
    * smaller than the shingle set). Jaccard estimate from bit agreement:
    * E[agree] = (1+J)/2·64, so Ĵ ≈ 2·agree/64 − 1, and the decision
    * threshold J ≥ 0.6 becomes the INTEGER test 2·agree − 64 ≥ 39.
    * Measured like every sketch here: scored over the prefix-filter
    * candidate set whose exact Jaccard is ground truth (complete at the
    * threshold — true recall, not recall-within-a-blocking), reporting
    * the confusion counts and precision/recall of the 8-byte sketch.
    * 32-bit words, not one 64-bit word: DuckDB's checked shift rejects
    * bit 63 (the bitmap-distinct lesson). All integers until the two
    * closing divisions. */
  private def bbitMinhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val words = docs(spark, dir)
      .select(col("doc_id"), expr(shingleExpr).as("sh"))
      .select(col("doc_id"), expr(shingleHashExpr).as("si"))
      .select(col("doc_id"),
        expr("""transform(sequence(0, 63), j -> array_min(transform(si,
          |  x -> ((2*j + 1) * x + 97*j + 13) % 2147483647)) % 2)"""
          .stripMargin).as("bits"))
      .select(col("doc_id"),
        expr("aggregate(slice(bits, 1, 32), 0L, (a, x) -> a * 2 + x)")
          .as("w0"),
        expr("aggregate(slice(bits, 33, 32), 0L, (a, x) -> a * 2 + x)")
          .as("w1"))
    val scored = prefixScored(spark, dir)
      .join(words.select(col("doc_id").as("doc_a"), col("w0").as("a0"),
        col("w1").as("a1")), "doc_a")
      .join(words.select(col("doc_id").as("doc_b"), col("w0").as("b0"),
        col("w1").as("b1")), "doc_b")
      .withColumn("agree",
        expr("cast(64 - bit_count(a0 ^ b0) - bit_count(a1 ^ b1) as bigint)"))
      .withColumn("pred", expr("2 * agree - 64 >= 39"))
      .withColumn("truth", expr("5 * inter >= 3 * un"))
    scored.agg(count(lit(1)).as("n_pairs"),
        sum(when($"truth", 1L).otherwise(0L)).cast("long").as("n_true"),
        sum(when($"pred" && $"truth", 1L).otherwise(0L)).cast("long").as("tp"),
        sum(when($"pred" && !$"truth", 1L).otherwise(0L)).cast("long").as("fp"),
        sum(when(!$"pred" && $"truth", 1L).otherwise(0L)).cast("long").as("fn"))
      .withColumn("precision",
        when($"tp" + $"fp" === 0, lit(null).cast("double"))
          .otherwise($"tp".cast("double") / ($"tp" + $"fp")))
      .withColumn("recall",
        when($"n_true" === 0, lit(null).cast("double"))
          .otherwise($"tp".cast("double") / $"n_true"))
  }

  private val bbitMinhashSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), tok AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS tok
      |  FROM t
      |), freq AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY tok
      |), sorted AS MATERIALIZED (
      |  SELECT doc_id, list(tok ORDER BY df, tok) AS stoks,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM tok JOIN freq USING (tok) GROUP BY doc_id
      |), pref AS MATERIALIZED (
      |  SELECT doc_id, stoks,
      |    unnest(stoks[:CAST(n - (3 * n + 4) // 5 + 1 AS INT)]) AS ptok
      |  FROM sorted
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.stoks AS ta, b.stoks AS tb
      |  FROM pref a JOIN pref b ON a.ptok = b.ptok AND a.doc_id < b.doc_id
      |), pairs AS (
      |  SELECT doc_a, doc_b,
      |    CAST(len(list_intersect(ta, tb)) AS BIGINT) AS inter,
      |    CAST(len(ta) + len(tb) - len(list_intersect(ta, tb)) AS BIGINT) AS un
      |  FROM cand
      |), sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM t
      |), bits AS MATERIALIZED (
      |  SELECT doc_id, list_transform(range(64),
      |    j -> list_min(list_transform(sh,
      |      s -> ((2*j + 1) * CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
      |            + 97*j + 13) % 2147483647)) % 2) AS bits
      |  FROM sh
      |), words AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), bits[1:32]),
      |      (a, x) -> a * 2 + x) AS w0,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), bits[33:64]),
      |      (a, x) -> a * 2 + x) AS w1
      |  FROM bits
      |), scored AS (
      |  SELECT p.*,
      |    CAST(64 - bit_count(xor(a.w0, b.w0)) - bit_count(xor(a.w1, b.w1))
      |      AS BIGINT) AS agree
      |  FROM pairs p JOIN words a ON a.doc_id = p.doc_a
      |  JOIN words b ON b.doc_id = p.doc_b
      |), conf AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    CAST(SUM(CASE WHEN 5 * inter >= 3 * un THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_true,
      |    CAST(SUM(CASE WHEN 2 * agree - 64 >= 39 AND 5 * inter >= 3 * un
      |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(SUM(CASE WHEN 2 * agree - 64 >= 39 AND NOT 5 * inter >= 3 * un
      |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |    CAST(SUM(CASE WHEN NOT 2 * agree - 64 >= 39 AND 5 * inter >= 3 * un
      |      THEN 1 ELSE 0 END) AS BIGINT) AS fn
      |  FROM scored
      |)
      |SELECT n_pairs, n_true, tp, fp, fn,
      |  CASE WHEN tp + fp = 0 THEN NULL
      |    ELSE CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
      |  CASE WHEN n_true = 0 THEN NULL
      |    ELSE CAST(tp AS DOUBLE) / n_true END AS recall
      |FROM conf""".stripMargin

  // ------------------------------------------- exact-substring dedup
  /** Exact-substring deduplication (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the gram-granular
    * form): a token position is DUPLICATED when its 8-token window also
    * occurs in an earlier document (keep-earliest, like every dedup op
    * here); the duplicated-token count is the length of the UNION of
    * the flagged 8-token windows (the spans the paper would trim), via
    * a lead() sweep over sorted window starts — min(8, next - cur) per
    * flagged window, 8 for the last.
    *
    * Scale shape: this is the map-reduce form of the paper's suffix
    * arrays — grams explode corpus-wide and SHUFFLE ON THE GRAM HASH to
    * find first occurrences (a sorted-grams pass, the one shuffle this
    * op owns), then verdicts roll up per doc. No doc-to-doc join, no
    * broadcast of anything corpus-sized. */
  private def dedupSubstring(spark: SparkSession, dir: String): DataFrame = {
    val g = docs(spark, dir)
      .select(col("doc_id"), col("toks"),
        posexplode(expr(
          """CASE WHEN size(toks) >= 8 THEN
            |  transform(sequence(1, size(toks) - 7),
            |    i -> cast(conv(substring(md5(cast(concat_ws(' ',
            |         slice(toks, i, 8)) as binary)), 1, 15), 16, 10)
            |         as bigint))
            |ELSE array() END""".stripMargin)).as(Seq("p", "gram")))
      .select(col("doc_id"), col("p").cast("long").as("p"), col("gram"))
    val firstDoc = g.groupBy(col("gram")).agg(min(col("doc_id")).as("fdoc"))
    val dup = g.join(firstDoc, Seq("gram")).filter(col("doc_id") > col("fdoc"))
    val sweep = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val cov = dup
      .withColumn("nxt", lead(col("p"), 1).over(sweep))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_windows"),
        sum(when(col("nxt").isNotNull,
            least(lit(8L), col("nxt") - col("p"))).otherwise(lit(8L)))
          .as("dup_tokens"))
    docs(spark, dir)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        greatest(size(col("toks")).cast("long") - 7, lit(0L))
          .as("n_windows"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)) /
          col("n_tokens").cast("double")).as("dup_ratio"))
      .orderBy(col("doc_id"))
  }

  private val dedupSubstringSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |), g AS (
      |  SELECT doc_id, CAST(i.range AS BIGINT) AS p,
      |    CAST(('0x' || substr(md5(array_to_string(
      |      toks[CAST(i.range AS INT):CAST(i.range + 7 AS INT)], ' ')),
      |      1, 15)) AS BIGINT) AS gram
      |  FROM t, range(1, 200) i WHERE i.range <= len(toks) - 7
      |), fd AS (
      |  SELECT gram, MIN(doc_id) AS fdoc FROM g GROUP BY gram
      |), dup AS (
      |  SELECT g.doc_id, g.p,
      |    lead(g.p) OVER (PARTITION BY g.doc_id ORDER BY g.p) AS nxt
      |  FROM g JOIN fd USING (gram) WHERE g.doc_id > fd.fdoc
      |), cov AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows,
      |    CAST(SUM(CASE WHEN nxt IS NOT NULL
      |      THEN LEAST(8, nxt - p) ELSE 8 END) AS BIGINT) AS dup_tokens
      |  FROM dup GROUP BY doc_id
      |)
      |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(GREATEST(len(toks) - 7, 0) AS BIGINT) AS n_windows,
      |  COALESCE(c.n_dup_windows, 0) AS n_dup_windows,
      |  COALESCE(c.dup_tokens, 0) AS dup_tokens,
      |  COALESCE(c.dup_tokens, 0) / CAST(len(toks) AS DOUBLE) AS dup_ratio
      |FROM t LEFT JOIN cov c USING (doc_id) ORDER BY t.doc_id""".stripMargin

  // --------------------------------------------- BPE merge-rule training
  /** BPE tokenizer training (Sennrich et al. 2016; the GPT-2 recipe):
    * 8 merge rounds over the corpus — each round counts adjacent symbol
    * pairs (weighted by word frequency), merges the most frequent pair
    * everywhere (left-to-right greedy), and records the rule. Symbols
    * start as characters plus a `</w>` end-of-word marker. Output: the
    * learned merge table, the artifact a tokenizer ships.
    *
    * Distributed shape (the classic trainer optimization): training runs
    * over the DISTINCT-WORD table with counts — vastly smaller than the
    * corpus under Zipf — as (word, pos, symbol) rows; pair counting is a
    * map-side aggregation, the per-round argmax is a 1-row driver
    * collect (bounded), and the merge itself is per-word window
    * arithmetic partitioned by word (greedy non-overlap for equal-symbol
    * runs via gaps-and-islands parity — for a != b adjacent matches
    * cannot overlap). Each round ends in an eager localCheckpoint (the
    * iterative-plan-growth rule). Tie-break: (count DESC, left ASC,
    * right ASC) — total, so the whole 8-round trajectory is
    * deterministic and the oracle re-runs it move for move in SQL. */
  private val bpeRounds = 8

  private def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (merges, _) = bpeTrain(spark, dir)
    merges.toDF("round", "lhs", "rhs", "merged", "pair_count")
      .orderBy(col("round"))
  }

  /** Shared trainer core: runs the [[bpeRounds]] merge rounds and returns
    * both the learned rule trajectory AND the final (w, cnt, pos, sym)
    * symbol table — i.e. every distinct corpus word already encoded with
    * all trained merges applied. [[bpeMerges]] reports the former,
    * [[bpeEncode]] the latter, so training and encoding cannot drift.
    *
    * Session-cached (round 14, the funnelFlags pattern): the trainer is a
    * driver-iterated 8-round loop whose full cost both text_bpe_merges and
    * text_bpe_encode paid per invocation; the rule list is a bounded
    * driver Seq and the final symbol table is localCheckpoint'd by its
    * last round, so caching the pair is plan-stable. */
  private val bpeCache = new scala.collection.concurrent.TrieMap[
    String, (Seq[(Long, String, String, String, Long)], DataFrame)]()

  private def bpeTrain(spark: SparkSession, dir: String)
      : (Seq[(Long, String, String, String, Long)], DataFrame) =
    bpeCache.getOrElseUpdate(
      s"${graft.core.SessionKeys.of(spark)}@$dir", bpeTrainRun(spark, dir))

  private def bpeTrainRun(spark: SparkSession, dir: String)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    val wWin = Window.partitionBy(col("w")).orderBy(col("pos"))
    val words = docs(spark, dir)
      .select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    var cur = words.select(col("w"), col("cnt"),
        posexplode(expr("concat(transform(sequence(1, length(w)), " +
          "i -> substring(w, i, 1)), array('</w>'))")).as(Seq("p", "sym")))
      .select(col("w"), col("cnt"), col("p").cast("long").as("pos"),
        col("sym"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var exhausted = false
    for (r <- 1 to bpeRounds if !exhausted) {
      val withNext = cur.withColumn("nxt", lead(col("sym"), 1).over(wWin))
      val topRows = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("a"), col("nxt").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      // a tiny corpus can run out of pairs before the round budget — the
      // oracle's empty t{r} CTEs contribute no rows the same way
      exhausted = topRows.isEmpty
      if (exhausted) () else {
      val top = topRows(0)
      val (a, b, c) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((r.toLong, a, b, a + b, c))
      // greedy left-to-right merge: for a != b matches never overlap; for
      // a == b a run of k matches keeps every other one (island parity)
      val matches = withNext
        .filter(col("sym") === a && col("nxt") === b)
        .select(col("w"), col("pos"))
        .withColumn("isl",
          col("pos") - row_number().over(wWin))
      val valid = matches
        .withColumn("off", col("pos") -
          min(col("pos")).over(Window.partitionBy(col("w"), col("isl"))))
        .filter(col("off") % 2 === 0)
        .select(col("w"), col("pos"))
      cur = cur
        .join(valid.withColumn("v", lit(1)), Seq("w", "pos"), "left")
        .join(valid.select(col("w"), (col("pos") + 1).as("pos"))
          .withColumn("d", lit(1)), Seq("w", "pos"), "left")
        .filter(col("d").isNull)
        .withColumn("sym", when(col("v") === 1, lit(a + b))
          .otherwise(col("sym")))
        .withColumn("pos", row_number().over(wWin).cast("long"))
        .select(col("w"), col("cnt"), col("pos"), col("sym"))
        .localCheckpoint(true)
      }
    }
    (merges.result(), cur)
  }

  // ----------------------------------------------------- BPE encoding
  /** BPE tokenizer APPLICATION: every distinct corpus word encoded with the
    * full trained merge table (the serving half of the Sennrich trainer —
    * what a tokenizer does to new text at data-pipeline time). Output per
    * word: its corpus frequency, subword count after merging, and the
    * subword sequence itself. The distributed shape is the trainer's: the
    * distinct-word table (Zipf-small vs the corpus) carries the symbols;
    * at 100 TB encoding raw documents is then a broadcast join of this
    * word->subwords table onto the token stream — never per-document
    * re-merging. Oracle: the same unrolled 8-round SQL chain as
    * text_bpe_merges, read at its final round instead of the rule list. */
  private def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val (_, fin) = bpeTrain(spark, dir)
    fin.groupBy(col("w"), col("cnt"))
      .agg(
        count(lit(1)).cast("long").as("n_syms"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("sym")))),
            x => x.getField("sym")), " ").as("subwords"))
      .select(col("w"), col("cnt"), col("n_syms"), col("subwords"))
      .orderBy(col("w"))
  }

  private def bpeEncodeSql =
    s"""$bpeChainSql
       |SELECT w, cnt, CAST(COUNT(*) AS BIGINT) AS n_syms,
       |  string_agg(sym, ' ' ORDER BY pos) AS subwords
       |FROM r$bpeRounds GROUP BY w, cnt ORDER BY w""".stripMargin

  // ------------------------------------------- n-gram LM quality surrogate
  /** Bigram language-model quality scoring — the CCNet/Gopher "perplexity
    * filter" shape with an integer-log surrogate. Trains corpus bigram /
    * left-context counts, then scores each document by the sum over its
    * bigram occurrences of floor-log2-ish `bitlen(count(a,b)) -
    * bitlen(count(a,·))` (bit length == `length(bin(n))`, identical in
    * both engines). Real pipelines use a KenLM float perplexity; the
    * bit-length surrogate keeps everything in exact BIGINT arithmetic so
    * the oracle hash-matches (ln/log2 are libm-dependent — the same
    * reason the HLL linear-counting correction is omitted,
    * queries/Sketches.scala) while preserving the ranking to within log2
    * quantization.
    *
    * Scale: the count tables are vocab-bounded (≪ corpus under Zipf) and
    * broadcast onto the bigram stream; the only shuffle is the final
    * per-doc sum, keyed by doc_id. */
  private def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val (big, uni, bc) = lmCountTables(spark, dir)
    val sc = big
      .join(broadcast(bc), Seq("a", "b"))
      .join(broadcast(uni), Seq("a"))
      .withColumn("lp",
        (length(bin(col("bcnt"))) - length(bin(col("ucnt")))).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("lm_score"))
    val avg = when(coalesce(col("n_bigrams"), lit(0L)) > 0,
      col("lm_score") / col("n_bigrams").cast("double")).otherwise(lit(0.0))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_score"), lit(0L)).as("lm_score"),
        avg.as("avg_logp"),
        (avg > -5.0).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** The trained LM artifacts: (bigram occurrence stream, left-context
    * counts, bigram counts). Shared by the batch query and the streaming
    * gate (which driver-collects the vocab-bounded count tables and
    * broadcasts them), so the two score with the same model. */
  private[graft] def lmCountTables(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val big = docs(spark, dir)
      .select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
    val uni = big.groupBy(col("a")).agg(count(lit(1)).as("ucnt"))
    val bc = big.groupBy(col("a"), col("b")).agg(count(lit(1)).as("bcnt"))
    (big, uni, bc)
  }

  /** Shared oracle CTE prefix: per-doc token arrays -> zipped bigram
    * stream (DuckDB parallel unnests zip). */
  private val bigramCtes =
    """WITH t AS MATERIALIZED (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |), big AS MATERIALIZED (
      |  SELECT doc_id, unnest(toks[:len(toks)-1]) AS a, unnest(toks[2:]) AS b
      |  FROM t WHERE len(toks) >= 2
      |), bc AS MATERIALIZED (
      |  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS bcnt FROM big GROUP BY a, b
      |)""".stripMargin

  private[graft] val lmScoreSql =
    s"""$bigramCtes,
       |uni AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS ucnt FROM big GROUP BY a),
       |sc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(length(bin(bcnt)) - length(bin(ucnt))) AS BIGINT) AS lm_score
       |  FROM big JOIN bc USING (a, b) JOIN uni USING (a) GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(n_bigrams, 0) AS n_bigrams,
       |  COALESCE(lm_score, 0) AS lm_score,
       |  CASE WHEN COALESCE(n_bigrams, 0) > 0
       |       THEN lm_score / CAST(n_bigrams AS DOUBLE) ELSE 0.0 END AS avg_logp,
       |  CASE WHEN COALESCE(n_bigrams, 0) > 0
       |       THEN lm_score / CAST(n_bigrams AS DOUBLE) ELSE 0.0 END > -5.0 AS keep
       |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------- CCNet head/middle/tail split
  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): per LANGUAGE,
    * rank documents by the bigram-LM quality score (the [[lmScore]] chain —
    * integer-log surrogate, exact BIGINT) and split into terciles: head
    * (best third), middle, tail; the pipeline keeps head+middle and drops
    * the tail. ntile(3) over (avg_logp DESC, doc_id) is exact integer
    * positional bucketing — identical ANSI semantics in both engines —
    * so unlike a float-threshold split the bucket boundaries carry no
    * rounding ambiguity. Docs with no bigrams score 0.0 (= best; they are
    * length-gated elsewhere).
    *
    * Scale: the count tables are vocab-bounded and broadcast; the rank is
    * a per-LANG window — language cardinality is small, so at 100 TB the
    * per-lang partitions are the skew concern and the window swaps for
    * the two-phase RankedWindow/percentile-selection reconstruction
    * (operators/RankedWindow, rel_exact_percentiles) per language; the
    * output is |langs|·3 rows either way. */
  /** Per-doc scored + tercile-bucketed table (doc_id, lang, n_bigrams,
    * avg_logp, bucket) — shared by the batch rollup and the streaming
    * gate (which derives its per-lang cut scores from these buckets). */
  private[graft] def ccnetDocBuckets(spark: SparkSession, dir: String)
      : DataFrame = {
    val (big, uni, bc) = lmCountTables(spark, dir)
    val sc = big
      .join(broadcast(bc), Seq("a", "b"))
      .join(broadcast(uni), Seq("a"))
      .withColumn("lp",
        (length(bin(col("bcnt"))) - length(bin(col("ucnt")))).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("lm_score"))
    val scored = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
      .join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          coalesce(col("lm_score"), lit(0L)) / col("n_bigrams").cast("double"))
          .otherwise(lit(0.0)).as("avg_logp"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("avg_logp").desc, col("doc_id"))
    scored.withColumn("bucket", ntile(3).over(w).cast("long"))
  }

  private def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    ccnetDocBuckets(spark, dir)
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("sum_bigrams"),
        max(col("avg_logp")).as("best_logp"),
        min(col("avg_logp")).as("worst_logp"))
      .withColumn("kept", col("bucket") <= 2)
      .orderBy(col("lang"), col("bucket"))
  }

  private val ccnetBucketsSql =
    s"""$bigramCtes,
       |uni AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS ucnt FROM big GROUP BY a),
       |sc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(length(bin(bcnt)) - length(bin(ucnt))) AS BIGINT) AS lm_score
       |  FROM big JOIN bc USING (a, b) JOIN uni USING (a) GROUP BY doc_id),
       |scored AS (
       |  SELECT d.doc_id, d.lang, COALESCE(n_bigrams, 0) AS n_bigrams,
       |    CASE WHEN COALESCE(n_bigrams, 0) > 0
       |         THEN lm_score / CAST(n_bigrams AS DOUBLE) ELSE 0.0 END AS avg_logp
       |  FROM documents d LEFT JOIN sc USING (doc_id)),
       |b AS (
       |  SELECT lang, n_bigrams, avg_logp,
       |    CAST(ntile(3) OVER (PARTITION BY lang
       |      ORDER BY avg_logp DESC, doc_id) AS BIGINT) AS bucket
       |  FROM scored)
       |SELECT lang, bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams,
       |  MAX(avg_logp) AS best_logp, MIN(avg_logp) AS worst_logp,
       |  bucket <= 2 AS kept
       |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin

  /** Oracle for the STREAMING CCNet gate (stream_ccnet_gate): the gate
    * scores arriving docs against broadcast count tables and buckets by
    * per-lang THRESHOLDS (the min avg_logp of the batch head / middle
    * terciles) — threshold semantics, not positional, because a stream
    * cannot rank docs it has not seen; ties AT a cut score therefore all
    * take the better bucket. The oracle re-derives the cuts from the
    * batch tercile build and re-buckets every doc by the same rule. */
  private[graft] val ccnetGateSql =
    s"""$bigramCtes,
       |uni AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS ucnt FROM big GROUP BY a),
       |sc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    CAST(SUM(length(bin(bcnt)) - length(bin(ucnt))) AS BIGINT) AS lm_score
       |  FROM big JOIN bc USING (a, b) JOIN uni USING (a) GROUP BY doc_id),
       |scored AS (
       |  SELECT d.doc_id, d.lang, COALESCE(n_bigrams, 0) AS n_bigrams,
       |    CASE WHEN COALESCE(n_bigrams, 0) > 0
       |         THEN lm_score / CAST(n_bigrams AS DOUBLE) ELSE 0.0 END AS avg_logp
       |  FROM documents d LEFT JOIN sc USING (doc_id)),
       |b AS (
       |  SELECT doc_id, lang, avg_logp,
       |    CAST(ntile(3) OVER (PARTITION BY lang
       |      ORDER BY avg_logp DESC, doc_id) AS BIGINT) AS bucket
       |  FROM scored),
       |cuts AS (
       |  SELECT lang,
       |    MIN(CASE WHEN bucket = 1 THEN avg_logp END) AS t1,
       |    MIN(CASE WHEN bucket = 2 THEN avg_logp END) AS t2
       |  FROM b GROUP BY lang)
       |SELECT s.doc_id, s.lang, s.n_bigrams, s.avg_logp,
       |  CAST(CASE WHEN s.avg_logp >= c.t1 THEN 1
       |            WHEN s.avg_logp >= c.t2 THEN 2 ELSE 3 END AS BIGINT) AS bucket,
       |  CASE WHEN s.avg_logp >= c.t1 THEN 1
       |       WHEN s.avg_logp >= c.t2 THEN 2 ELSE 3 END <= 2 AS kept
       |FROM scored s JOIN cuts c USING (lang)
       |ORDER BY s.doc_id""".stripMargin

  // ------------------------------------------------- TextRank keywords
  /** TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    * PageRank over the word co-occurrence graph (adjacent-word edges,
    * undirected, self-loops dropped), run for a fixed 5 iterations in
    * FIXED-POINT integer arithmetic — scores in millionths, damping 0.85
    * as 850000/150000, every division an integer `div` — so both engines
    * walk the identical trajectory (float PageRank would diverge in the
    * last bits under different summation orders).
    *
    * Scale: the graph is vocab-bounded (nodes = vocabulary, edges ≤
    * adjacency pairs actually seen), orders smaller than the corpus;
    * score vectors broadcast into the edge join each round; per-round
    * localCheckpoint caps plan growth (CLAUDE.md rule). */
  private val prIters = 5

  /** The word co-occurrence edge table with hoisted out-weights — the
    * corpus-proportional input pass of [[textRank]], built once per
    * (session, dataset) (round 14, the lshEdges pattern; the 5 PageRank
    * rounds stay live per invocation). */
  private def textRankEdges(spark: SparkSession, dir: String): DataFrame =
    simsCache.getOrElseUpdate(
      s"tredges:${graft.core.SessionKeys.of(spark)}@$dir", {
        val big = docs(spark, dir)
          .select(explode(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as("bg"))
          .select(col("bg.a").as("a"), col("bg.b").as("b"))
          .filter(col("a") =!= col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("bcnt"))
        val ed = big.select(col("a").as("src"), col("b").as("dst"),
            col("bcnt").as("c"))
          .unionAll(big.select(col("b").as("src"), col("a").as("dst"),
            col("bcnt").as("c")))
          .groupBy(col("src"), col("dst")).agg(sum(col("c")).as("wt"))
        val ow = ed.groupBy(col("src")).agg(sum(col("wt")).as("wsrc"))
        ed.join(ow, "src").localCheckpoint(true)
      })

  private def textRank(spark: SparkSession, dir: String): DataFrame = {
    val edges = textRankEdges(spark, dir)
    var s = edges.select(col("src").as("w")).distinct()
      .withColumn("sc", lit(1000000L))
    for (_ <- 1 to prIters) {
      // coalesce(1): the iterate is vocab-bounded (one row per word) —
      // without it every round materialized 32 near-empty shuffle tasks
      // (the round-10 emb_pca lesson). Long-sum aggregation is
      // order-independent, so the rows are bit-identical.
      s = edges.join(broadcast(s.withColumnRenamed("w", "src")), "src")
        .withColumn("contrib", expr("(sc * wt) div wsrc"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("inflow"))
        .select(col("dst").as("w"),
          (lit(150000L) + expr("(850000 * inflow) div 1000000")).as("sc"))
        .coalesce(1)
        .localCheckpoint(true)
    }
    import org.apache.spark.sql.expressions.Window
    s.withColumn("rank",
        row_number().over(Window.orderBy(col("sc").desc, col("w"))).cast("long"))
      .select(col("rank"), col("w"), col("sc").as("score"))
      .orderBy(col("rank"))
  }

  private val textRankSql = {
    val rounds = (1 to prIters).map { r =>
      s"""s$r AS MATERIALIZED (
         |  SELECT e.dst AS w,
         |    CAST(150000 + (850000 * SUM((s.sc * e.wt) // e.wsrc)) // 1000000
         |      AS BIGINT) AS sc
         |  FROM e JOIN s${r - 1} s ON e.src = s.w GROUP BY e.dst
         |)""".stripMargin
    }.mkString(", ")
    s"""$bigramCtes,
       |ed AS MATERIALIZED (
       |  SELECT src, dst, CAST(SUM(c) AS BIGINT) AS wt FROM (
       |    SELECT a AS src, b AS dst, bcnt AS c FROM bc WHERE a <> b
       |    UNION ALL
       |    SELECT b AS src, a AS dst, bcnt AS c FROM bc WHERE a <> b)
       |  GROUP BY src, dst
       |), ow AS MATERIALIZED (
       |  SELECT src, CAST(SUM(wt) AS BIGINT) AS wsrc FROM ed GROUP BY src
       |), e AS MATERIALIZED (
       |  SELECT ed.src, ed.dst, ed.wt, ow.wsrc FROM ed JOIN ow USING (src)
       |), s0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS w, CAST(1000000 AS BIGINT) AS sc FROM ed
       |), $rounds
       |SELECT CAST(row_number() OVER (ORDER BY sc DESC, w) AS BIGINT) AS rank,
       |  w, sc AS score
       |FROM s$prIters ORDER BY rank""".stripMargin
  }

  /** The WITH-chain shared by the merges and encode oracles: distinct
    * words -> char symbols -> bpeRounds unrolled merge rounds (each
    * materialized — DuckDB's inliner otherwise multiplies parquet scans
    * exponentially; see CLAUDE.md). */
  private lazy val bpeChainSql: String = {
    val base =
      """w AS MATERIALIZED (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents)
        |  GROUP BY w
        |), r0 AS MATERIALIZED (
        |  SELECT w, cnt, CAST(i.range AS BIGINT) AS pos,
        |    CASE WHEN i.range < length(w)
        |         THEN substr(w, CAST(i.range + 1 AS INT), 1)
        |         ELSE '</w>' END AS sym
        |  FROM w, range(32) i WHERE i.range <= length(w)
        |)""".stripMargin
    val rounds = (1 to bpeRounds).map { r =>
      val prev = s"r${r - 1}"
      s"""p$r AS MATERIALIZED (
         |  SELECT w, cnt, pos, sym,
         |    lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
         |  FROM $prev
         |), t$r AS MATERIALIZED (
         |  SELECT a, b, c FROM (
         |    SELECT sym AS a, nxt AS b, CAST(SUM(cnt) AS BIGINT) AS c,
         |      row_number() OVER (ORDER BY SUM(cnt) DESC, sym, nxt) AS rn
         |    FROM p$r WHERE nxt IS NOT NULL GROUP BY sym, nxt)
         |  WHERE rn = 1
         |), v$r AS MATERIALIZED (
         |  SELECT w, pos FROM (
         |    SELECT w, pos,
         |      pos - MIN(pos) OVER (PARTITION BY w, isl) AS off
         |    FROM (
         |      SELECT m.w, m.pos,
         |        m.pos - row_number() OVER (PARTITION BY m.w ORDER BY m.pos)
         |          AS isl
         |      FROM p$r m, t$r t WHERE m.sym = t.a AND m.nxt = t.b))
         |  WHERE off % 2 = 0
         |), r$r AS MATERIALIZED (
         |  SELECT s.w, s.cnt,
         |    CAST(row_number() OVER (PARTITION BY s.w ORDER BY s.pos)
         |      AS BIGINT) AS pos,
         |    CASE WHEN v.pos IS NOT NULL THEN (SELECT a || b FROM t$r)
         |         ELSE s.sym END AS sym
         |  FROM $prev s
         |  LEFT JOIN v$r v ON s.w = v.w AND s.pos = v.pos
         |  LEFT JOIN v$r d ON s.w = d.w AND s.pos = d.pos + 1
         |  WHERE d.pos IS NULL
         |)""".stripMargin
    }.mkString(", ")
    s"WITH $base, $rounds"
  }

  private def bpeMergesSql = {
    val out = (1 to bpeRounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, a AS lhs, b AS rhs, " +
        s"a || b AS merged, c AS pair_count FROM t$r")
      .mkString("\nUNION ALL ")
    s"$bpeChainSql\n$out\nORDER BY round"
  }

  // ------------------------------------------------- curation funnel
  /** The corpus-curation funnel every pretraining pipeline reports:
    * cumulative survivor counts through quality gate → repetition gate →
    * exact dedup → MinHash near-dedup (the keep-first bucket semantics of
    * stream_dedup_minhash, batch-evaluated) → train/eval decontamination.
    * Composes the per-doc verdicts of the five existing operators; each
    * stage applies on the previous stage's survivors. The oracle embeds
    * the five already-proven oracle queries as derived tables — one
    * engine run, one SQL, same verdicts. */
  /** The five per-doc batch verdict frames (q/r/e/m as (doc_id, flag);
    * dc0 covers train docs only) — shared by the funnel rollup and the
    * per-stage audit so they cannot drift. */
  private def funnelVerdicts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val q = quality(spark, dir).select(col("doc_id"), col("keep").as("q"))
    val r = repetition(spark, dir).select(col("doc_id"), col("keep").as("r"))
    val e = dedupExact(spark, dir)
      .select(col("doc_id"), (!col("is_duplicate")).as("e"))
    val m = lshBandRows(Tables.documents(spark, dir)
        .select(col("doc_id"), col("text")))
      .withColumn("winner",
        min(col("doc_id")).over(Window.partitionBy(col("band_val"))))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("winner") === col("doc_id"), 1L).otherwise(0L))
        .as("nf"), count(lit(1)).as("nb"))
      .select(col("doc_id"), (col("nf") === col("nb")).as("m"))
    val d = decontaminate(spark, dir)
      .select(col("doc_id"), (!col("contaminated")).as("dc0"))
    (q, r, e, m, d)
  }

  private val flagsCache =
    new scala.collection.concurrent.TrieMap[String, DataFrame]()

  /** The joined per-doc flag frame (doc_id, q, r, e, m, dc) — built ONCE
    * per (session, dataset) and localCheckpoint'd, shared by the batch
    * funnel and the attrition audit (the [[lshEdges]] pattern: the two
    * reports ran the identical five verdict stages back to back — the
    * audit benched at the funnel's full cost before this cache). Eager
    * checkpoint so the five-stage tree is not re-optimized per consumer;
    * session-scoped key because checkpointed blocks die with their
    * session. */
  private def funnelFlags(spark: SparkSession, dir: String): DataFrame =
    flagsCache.getOrElseUpdate(s"${graft.core.SessionKeys.of(spark)}@$dir", {
      val (q, r, e, m, d) = funnelVerdicts(spark, dir)
      Tables.documents(spark, dir).select(col("doc_id"))
        .join(q, "doc_id").join(r, "doc_id").join(e, "doc_id")
        .join(m, "doc_id").join(d, Seq("doc_id"), "left")
        .select(col("doc_id"), col("q"), col("r"), col("e"), col("m"),
          (col("dc0").isNotNull && col("dc0")).as("dc"))
        .localCheckpoint(true)
    })

  private def curationFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelRollupFlags(spark, funnelFlags(spark, dir))

  // ------------------------------------------------ funnel attrition audit
  /** Per-stage ATTRITION AUDIT of the curation funnel — the data-lineage
    * report a production pipeline files next to the survivor counts: for
    * every document, the FIRST stage (in funnel order) that rejects it,
    * or 'kept'; rolled up to (stage, n_docs, sample_doc) with the
    * smallest rejected doc_id as the concrete exemplar an auditor opens
    * first. Stage ids align with corpus_curation_funnel's numbering
    * (stage k rejects what stage k's survivor count no longer includes;
    * 7 = kept), so the two reports cross-check: n_docs(kept) equals the
    * funnel's final survivor count, and the audit partitions the corpus
    * exactly once. Composes the same five per-doc verdict frames through
    * [[funnelVerdicts]] — audit and funnel cannot drift. */
  private def funnelAudit(spark: SparkSession, dir: String): DataFrame = {
    val fl = funnelFlags(spark, dir)
    val tagged = fl.withColumn("stage_id",
        when(!col("q"), 2L).when(!col("r"), 3L).when(!col("e"), 4L)
          .when(!col("m"), 5L).when(!col("dc"), 6L).otherwise(7L))
      .withColumn("stage",
        when(col("stage_id") === 2L, "quality")
          .when(col("stage_id") === 3L, "repetition")
          .when(col("stage_id") === 4L, "exact_dedup")
          .when(col("stage_id") === 5L, "near_dedup")
          .when(col("stage_id") === 6L, "decontaminated")
          .otherwise("kept"))
    tagged.groupBy(col("stage_id"), col("stage"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("sample_doc"))
      .orderBy(col("stage_id"))
  }

  /** Shared funnel tail: joins the five per-doc verdict frames
    * (q/r/e/m as (doc_id, <flag>); dc0 as (doc_id, dc0) covering train
    * docs only — absent rows grade false) and folds the cumulative
    * survivor counts. Used verbatim by the batch funnel and its
    * streaming twin, so the two report through one code path. */
  private[graft] def funnelRollup(spark: SparkSession, documents: DataFrame,
      q: DataFrame, r: DataFrame, e: DataFrame, m: DataFrame,
      d: DataFrame): DataFrame =
    funnelRollupFlags(spark, documents.select(col("doc_id"))
      .join(q, "doc_id").join(r, "doc_id").join(e, "doc_id")
      .join(m, "doc_id").join(d, Seq("doc_id"), "left")
      .select(col("q"), col("r"), col("e"), col("m"),
        (col("dc0").isNotNull && col("dc0")).as("dc")))

  private def funnelRollupFlags(spark: SparkSession, fl: DataFrame)
      : DataFrame = {
    def cum(c: Column) = sum(when(c, 1L).otherwise(0L))
    val h = fl.agg(
      count(lit(1)).cast("long"),
      cum(col("q")),
      cum(col("q") && col("r")),
      cum(col("q") && col("r") && col("e")),
      cum(col("q") && col("r") && col("e") && col("m")),
      cum(col("q") && col("r") && col("e") && col("m") && col("dc"))).head()
    import spark.implicits._
    Seq((1L, "total", h.getLong(0)), (2L, "quality", h.getLong(1)),
      (3L, "repetition", h.getLong(2)), (4L, "exact_dedup", h.getLong(3)),
      (5L, "near_dedup", h.getLong(4)),
      (6L, "decontaminated", h.getLong(5)))
      .toDF("stage_id", "stage", "n_docs").orderBy(col("stage_id"))
  }

  /** Exposed for the streaming funnel twin (same report, same oracle). */
  private[graft] def curationFunnelOracleSql: String = curationFunnelSql

  private def curationFunnelSql =
    s"""WITH qf AS (SELECT doc_id, keep AS q FROM ($qualitySql)),
       |rf AS (SELECT doc_id, keep AS r FROM ($repetitionSql)),
       |ef AS (SELECT doc_id, NOT is_duplicate AS e FROM ($dedupExactSql)),
       |mf AS (SELECT doc_id, NOT is_duplicate AS m FROM ($dedupMinhashStreamSql)),
       |cf AS (SELECT doc_id, NOT contaminated AS dc0 FROM ($decontaminateSql)),
       |fl AS (
       |  SELECT qf.q, rf.r, ef.e, mf.m,
       |    (cf.doc_id IS NOT NULL AND cf.dc0) AS dc
       |  FROM documents d
       |  JOIN qf USING (doc_id) JOIN rf USING (doc_id)
       |  JOIN ef USING (doc_id) JOIN mf USING (doc_id)
       |  LEFT JOIN cf USING (doc_id)
       |)
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS stage_id, 'total' AS stage,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs FROM fl
       |  UNION ALL SELECT CAST(2 AS BIGINT), 'quality',
       |    CAST(SUM(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) FROM fl
       |  UNION ALL SELECT CAST(3 AS BIGINT), 'repetition',
       |    CAST(SUM(CASE WHEN q AND r THEN 1 ELSE 0 END) AS BIGINT) FROM fl
       |  UNION ALL SELECT CAST(4 AS BIGINT), 'exact_dedup',
       |    CAST(SUM(CASE WHEN q AND r AND e THEN 1 ELSE 0 END) AS BIGINT) FROM fl
       |  UNION ALL SELECT CAST(5 AS BIGINT), 'near_dedup',
       |    CAST(SUM(CASE WHEN q AND r AND e AND m THEN 1 ELSE 0 END) AS BIGINT) FROM fl
       |  UNION ALL SELECT CAST(6 AS BIGINT), 'decontaminated',
       |    CAST(SUM(CASE WHEN q AND r AND e AND m AND dc THEN 1 ELSE 0 END) AS BIGINT) FROM fl
       |) ORDER BY stage_id""".stripMargin

  private def funnelAuditSql =
    s"""WITH qf AS (SELECT doc_id, keep AS q FROM ($qualitySql)),
       |rf AS (SELECT doc_id, keep AS r FROM ($repetitionSql)),
       |ef AS (SELECT doc_id, NOT is_duplicate AS e FROM ($dedupExactSql)),
       |mf AS (SELECT doc_id, NOT is_duplicate AS m FROM ($dedupMinhashStreamSql)),
       |cf AS (SELECT doc_id, NOT contaminated AS dc0 FROM ($decontaminateSql)),
       |fl AS (
       |  SELECT d.doc_id, qf.q, rf.r, ef.e, mf.m,
       |    (cf.doc_id IS NOT NULL AND cf.dc0) AS dc
       |  FROM documents d
       |  JOIN qf USING (doc_id) JOIN rf USING (doc_id)
       |  JOIN ef USING (doc_id) JOIN mf USING (doc_id)
       |  LEFT JOIN cf USING (doc_id)
       |), tagged AS (
       |  SELECT doc_id,
       |    CASE WHEN NOT q THEN 2 WHEN NOT r THEN 3 WHEN NOT e THEN 4
       |         WHEN NOT m THEN 5 WHEN NOT dc THEN 6 ELSE 7 END AS stage_id
       |  FROM fl)
       |SELECT CAST(stage_id AS BIGINT) AS stage_id,
       |  CASE stage_id WHEN 2 THEN 'quality' WHEN 3 THEN 'repetition'
       |    WHEN 4 THEN 'exact_dedup' WHEN 5 THEN 'near_dedup'
       |    WHEN 6 THEN 'decontaminated' ELSE 'kept' END AS stage,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  MIN(doc_id) AS sample_doc
       |FROM tagged GROUP BY stage_id ORDER BY stage_id""".stripMargin

  // ----------------------------------------------------- dataset card
  /** Dataset-card / datasheet metric rollup — the one-page summary every
    * corpus release ships (Gebru et al.'s datasheets; HF dataset cards):
    * size metrics (docs, tokens, chars, languages, sources), the
    * mean-tokens shape stat, and the curation health rates (exact-dup,
    * near-dup, quality-kept) drawn from the SAME cached verdict frame
    * the funnel and audit report through ([[funnelFlags]]) — one more
    * consumer of the shared five-stage computation, so the card cannot
    * disagree with the funnel. Counts exact BIGINT; each rate one double
    * division. Output is (metric_id, metric, n, ratio) rows — nullable
    * n for pure ratios, nullable ratio for pure counts. */
  private def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = docs(spark, dir).agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("toks")).cast("long")).as("n_tokens"),
      sum(col("n_chars")).as("n_chars"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources")).head()
    val fl = funnelFlags(spark, dir)
    val rates = fl.agg(
      sum(when(!col("e"), 1L).otherwise(0L)).as("n_dup"),
      sum(when(!col("m"), 1L).otherwise(0L)).as("n_near"),
      sum(when(col("q"), 1L).otherwise(0L)).as("n_kept")).head()
    val nDocs = base.getLong(0); val nTok = base.getLong(1)
    val nDup = rates.getLong(0); val nNear = rates.getLong(1)
    val nKept = rates.getLong(2)
    Seq(
      (1L, "n_docs", Some(nDocs), None: Option[Double]),
      (2L, "n_tokens", Some(nTok), None),
      (3L, "n_chars", Some(base.getLong(2)), None),
      (4L, "n_langs", Some(base.getLong(3)), None),
      (5L, "n_sources", Some(base.getLong(4)), None),
      (6L, "mean_doc_tokens", None: Option[Long],
        Some(nTok.toDouble / nDocs)),
      (7L, "exact_dup_docs", Some(nDup), Some(nDup.toDouble / nDocs)),
      (8L, "near_dup_docs", Some(nNear), Some(nNear.toDouble / nDocs)),
      (9L, "quality_kept", Some(nKept), Some(nKept.toDouble / nDocs)))
      .toDF("metric_id", "metric", "n", "ratio")
      .orderBy(col("metric_id"))
  }

  private def datasetCardSql =
    s"""WITH t AS (
       |  SELECT doc_id, lang, source, n_chars,
       |    string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents
       |), base AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(toks)) AS BIGINT) AS n_tokens,
       |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
       |  FROM t
       |), ed AS (
       |  SELECT CAST(SUM(CASE WHEN is_duplicate THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup FROM ($dedupExactSql)
       |), nd AS (
       |  SELECT CAST(SUM(CASE WHEN is_duplicate THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_near FROM ($dedupMinhashStreamSql)
       |), qk AS (
       |  SELECT CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept FROM ($qualitySql)
       |)
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS metric_id, 'n_docs' AS metric,
       |    n_docs AS n, CAST(NULL AS DOUBLE) AS ratio FROM base
       |  UNION ALL SELECT 2, 'n_tokens', n_tokens, NULL FROM base
       |  UNION ALL SELECT 3, 'n_chars', n_chars, NULL FROM base
       |  UNION ALL SELECT 4, 'n_langs', n_langs, NULL FROM base
       |  UNION ALL SELECT 5, 'n_sources', n_sources, NULL FROM base
       |  UNION ALL SELECT 6, 'mean_doc_tokens', CAST(NULL AS BIGINT),
       |    CAST(n_tokens AS DOUBLE) / n_docs FROM base
       |  UNION ALL SELECT 7, 'exact_dup_docs', ed.n_dup,
       |    CAST(ed.n_dup AS DOUBLE) / b.n_docs FROM ed, base b
       |  UNION ALL SELECT 8, 'near_dup_docs', nd.n_near,
       |    CAST(nd.n_near AS DOUBLE) / b.n_docs FROM nd, base b
       |  UNION ALL SELECT 9, 'quality_kept', qk.n_kept,
       |    CAST(qk.n_kept AS DOUBLE) / b.n_docs FROM qk, base b
       |) ORDER BY metric_id""".stripMargin

  // ------------------------------------------------------------ exact dedup
  /** Exact dedup by content hash: group size and canonical (min doc_id)
    * membership per document — the hash-groupBy dedup that scales to any
    * corpus (shuffle on the 128-bit hash only). */
  private def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(col("text").cast("binary"))
    val w = Window.partitionBy(col("fp"))
    Tables.documents(spark, dir)
      .withColumn("fp", h)
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("canonical_doc", min(col("doc_id")).over(w))
      .withColumn("is_duplicate", col("doc_id") =!= col("canonical_doc"))
      .select(col("doc_id"), col("fp"), col("group_size"),
        col("canonical_doc"), col("is_duplicate"))
      .orderBy(col("doc_id"))
  }

  private val dedupExactSql =
    """SELECT doc_id, md5(text) AS fp,
      |  count(*) OVER (PARTITION BY md5(text)) AS group_size,
      |  MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_doc,
      |  doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
      |FROM documents ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------- n-gram Jaccard
  /** Near-dup candidates by 3-token-shingle Jaccard within (lang, length
    * band) buckets; top-50 pairs. The bucket key bounds the pair join. */
  private def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // Candidate pairs from the (lang, length-band) bucket, intersections
    // per pair. Strategy note (measured both): the alternative explode +
    // equi-join-on-shingle "set-similarity join" is near-linear on
    // heavy-tailed REAL corpora (most shingles rare), but on this dense
    // 31-token synthetic vocabulary popular shingles occur in hundreds of
    // docs and the join squares them (16.8s vs 4.8s here). Per-pair
    // intersects bound the work by bucket size instead; at 100 TB pick by
    // shingle-frequency profile and cap bucket/shingle frequency.
    // The per-pair intersect is the hot loop: each shingle is hashed ONCE
    // per document to a 60-bit md5-derived int (both engines derive the
    // same hashes, so any collision is identical cross-engine and the
    // compare stays bit-exact; semantically this is the standard hashed-
    // shingle approximation, collision odds ~1e-13 per pair), the arrays
    // are sorted once, and pairs are scored by the codegen'd two-pointer
    // merge (functions/SortedIntersectCount) — 8-byte primitive compares,
    // no per-pair hash set.
    graft.functions.SortedIntersectCount.register(spark)
    val sh = docs(spark, dir).select(
      col("doc_id"), col("lang"),
      expr("size(toks) div 10").as("band"),
      expr("""array_sort(array_distinct(transform(sequence(1, size(toks) - 2),
        i -> cast(conv(substring(md5(cast(concat_ws(' ', element_at(toks, i),
               element_at(toks, i + 1), element_at(toks, i + 2)) as binary)),
               1, 15), 16, 10) as bigint))))""").as("sh"))
    val a = sh.select(col("lang"), col("band"), col("doc_id").as("doc_a"),
      col("sh").as("sh_a"))
    val b = sh.select(col("lang"), col("band"), col("doc_id").as("doc_b"),
      col("sh").as("sh_b"))
    a.join(b, Seq("lang", "band"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", expr("sorted_intersect_count(sh_a, sh_b)"))
      .filter(col("inter") >= 1)
      .withColumn("jaccard",
        round(col("inter") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"), 6))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(50)
  }

  private val ngramJaccardSql =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, lang, len(toks) // 10 AS band,
      |    list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> CAST(('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15)) AS BIGINT))) AS sh
      |  FROM t
      |), pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
      |    len(a.sh) AS na, len(b.sh) AS nb
      |  FROM sh a JOIN sh b
      |    ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b,
      |  ROUND(inter / CAST(na + nb - inter AS DOUBLE), 6) AS jaccard
      |FROM pairs
      |WHERE inter >= 1
      |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 50""".stripMargin

  // ---------------------------------------------------------- MinHash + LSH
  /** MinHash (k=8) + LSH (4 bands x 2 rows): per-doc signatures, banded
    * bucket join for candidates, estimated Jaccard = matching-minhash
    * fraction; top-50 candidate pairs. spark.ml's MinHashLSH is the
    * library path; this formulation is engine-checkable cross-engine. */
  /** Shared MinHash plumbing (batch near-dup join + streaming keep-first
    * dedup): 3-shingle set → md5 ints → 8 permutation min-hashes →
    * 4 two-hash band values. Kept as expression constants so the batch
    * and streaming paths cannot drift. */
  private[graft] val shingleExpr =
    """array_distinct(transform(sequence(1, size(toks) - 2),
      |    i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
      |                   element_at(toks, i + 2))))""".stripMargin
  private[graft] val shingleHashExpr =
    "transform(sh, s -> cast(conv(substr(md5(cast(s as binary)), 1, 8), 16, 10) as bigint))"
  // ONE fold over si, si referenced ONCE (round 12): the previous
  // transform-of-array_min form referenced si inside the outer lambda,
  // so after CollapseProject inlined the chained projections the
  // md5-per-shingle pipeline re-ran once PER PERMUTATION — 8 hash
  // passes per doc (measured via tools/ScurveProbe; the scurve query
  // paid the same shape). The fold computes identical slot values:
  // slot j = min over shingles of ((2j+1)·x + 97j + 13) mod p, seeded
  // at p itself (every permuted value is < p, so the seed never
  // survives a non-empty si; empty si yields the p-sentinel instead of
  // the old nulls — both only reachable behind the size(sh) > 0 guards).
  private[graft] val minhashExpr =
    """aggregate(si,
      |  transform(sequence(0, 7), j -> cast(2147483647 as bigint)),
      |  (acc, x) -> zip_with(acc, sequence(0, 7),
      |    (a, j) -> least(a, ((2*j + 1) * x + 97*j + 13) % 2147483647)))""".stripMargin

  /** The 4 band values computed straight from `si` in ONE expression
    * (aggregate's FINISH lambda reads the fold buffer), for consumers
    * that would otherwise reference `mh` several times inside a single
    * projection — each reference re-inlines the whole md5 chain (the
    * same CollapseProject duplication [[minhashExpr]]'s doc describes;
    * element_at(mh, k) ×8 meant 8 hash passes per doc). The
    * explode(sequence)+col("mh") pattern does NOT need this: a Generate
    * node materializes its child projection once per input row. */
  private[graft] val bandArrayExpr =
    """aggregate(si,
      |  transform(sequence(0, 7), j -> cast(2147483647 as bigint)),
      |  (acc, x) -> zip_with(acc, sequence(0, 7),
      |    (a, j) -> least(a, ((2*j + 1) * x + 97*j + 13) % 2147483647)),
      |  acc -> transform(sequence(0, 3), b -> concat_ws(':', b,
      |    element_at(acc, 2*b + 1), element_at(acc, 2*b + 2))))""".stripMargin

  /** Single-md5-pass variants for the fuzzy-decontamination family
    * (round-13, verdict r12 #3): consumers that need BOTH the 60-bit
    * exact-Jaccard hashes (15-hex prefix) and the MinHash permutation
    * input (8-hex prefix) of the SAME digest used to run md5 twice per
    * shingle — once per derived column, because CollapseProject
    * re-inlines a named intermediate into every consumer. These
    * expressions instead read a `hexes` column holding the raw md5 hex
    * strings, which the caller materializes ONCE per row behind a
    * Generate barrier (`explode(array(transform(sh, s -> md5(...))))`
    * — a Generate output attribute cannot be collapsed back into
    * downstream projections, so the digests are computed exactly once;
    * the stream-safe sibling of the scurve relational rebuild). Values
    * are bit-identical to the two-pass forms: same digest, same
    * prefixes, same fold arithmetic as [[bandArrayExpr]]. */
  private[graft] val sjFromHexesExpr =
    """array_sort(array_distinct(transform(hexes,
      |  h -> cast(conv(substr(h, 1, 15), 16, 10) as bigint))))""".stripMargin
  private[graft] val mhFromHexesExpr =
    """aggregate(
      |  transform(hexes, h -> cast(conv(substr(h, 1, 8), 16, 10) as bigint)),
      |  transform(sequence(0, 7), j -> cast(2147483647 as bigint)),
      |  (acc, x) -> zip_with(acc, sequence(0, 7),
      |    (a, j) -> least(a, ((2*j + 1) * x + 97*j + 13) % 2147483647)))"""
      .stripMargin
  private[graft] val bandsFromHexesExpr =
    """aggregate(
      |  transform(hexes, h -> cast(conv(substr(h, 1, 8), 16, 10) as bigint)),
      |  transform(sequence(0, 7), j -> cast(2147483647 as bigint)),
      |  (acc, x) -> zip_with(acc, sequence(0, 7),
      |    (a, j) -> least(a, ((2*j + 1) * x + 97*j + 13) % 2147483647)),
      |  acc -> transform(sequence(0, 3), b -> concat_ws(':', b,
      |    element_at(acc, 2*b + 1), element_at(acc, 2*b + 2))))""".stripMargin

  /** (doc_id, hexes) — the one-md5-pass digest materialization all
    * [[sjFromHexesExpr]]-family consumers build on: pure map + a
    * 1-element explode (stream-safe, no shuffle). */
  private[graft] def hexRows(df: DataFrame): DataFrame =
    df.withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn("sh", expr(shingleExpr))
      .select(col("doc_id"),
        explode(array(expr("transform(sh, s -> md5(cast(s as binary)))")))
          .as("hexes"))

  private val edgeCache =
    new scala.collection.concurrent.TrieMap[String, DataFrame]()

  /** THE LSH-band candidate edge set (node = doc, edge = pair of docs
    * sharing ≥ 1 band bucket), oriented a &lt; b, distinct — the one graph
    * under `graph_triangles`, `graph_clustering_coeff`,
    * `graph_assortativity`, and `dedup_minhash_eval`'s candidate side.
    * Built ONCE per (session, dataset) and localCheckpoint'd (round-11,
    * verdict r10 #3: the three graph queries each rebuilt this identical
    * edge set — ~2/3 of the family's bench time was the duplicated band
    * self-join). Eager checkpoint rather than persist: the edge set
    * re-enters every consumer's logical plan, and truncated lineage keeps
    * Catalyst from re-optimizing the shingle→minhash→self-join tree per
    * query (the pinned-matrix lesson). Session-scoped key: checkpointed
    * blocks die with their session, so a frame cached under one session
    * must never be served to another. */
  private[graft] def lshEdges(spark: SparkSession, dir: String): DataFrame =
    edgeCache.getOrElseUpdate(s"${graft.core.SessionKeys.of(spark)}@$dir", {
      val bands = lshBandRows(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      bands.select(col("band_val"), col("doc_id").as("a"))
        .join(bands.select(col("band_val"), col("doc_id").as("b")),
          Seq("band_val"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b")).distinct()
        .localCheckpoint(true)
    })

  /** (doc_id, band_val) rows for MinHash LSH banding over a (doc_id,
    * text) frame — pure per-row map + explode, streaming-safe. */
  private[graft] def lshBandRows(df: DataFrame): DataFrame =
    df.withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn("sh", expr(shingleExpr))
      .withColumn("si", expr(shingleHashExpr))
      .withColumn("mh", expr(minhashExpr))
      // sub-shingle guard (same as fuzzySigRows): a <3-token doc has null
      // minhash slots — concat_ws would skip them and collide all such
      // docs on bare '0'..'3' bands while the oracle's `||` yields NULL.
      // Emit no bands for shingle-less docs so every path agrees.
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), explode(expr("sequence(0, 3)")).as("b"),
        col("mh"))
      .select(col("doc_id"),
        concat_ws(":", col("b"),
          expr("element_at(mh, 2*b + 1)"), expr("element_at(mh, 2*b + 2)"))
          .as("band_val"))

  private def minHashLsh(spark: SparkSession, dir: String): DataFrame = {
    // shingle -> md5-int once, THEN the 8 permutation hashes over the int
    // array: md5 is the expensive part and must not run per hash function
    val sig = docs(spark, dir)
      .select(col("doc_id"), expr(shingleExpr).as("sh"))
      .select(col("doc_id"), expr(shingleHashExpr).as("si"))
      .select(col("doc_id"), expr(minhashExpr).as("mh"))
      // signatures are reused by both sides of the candidate self-join and
      // by the final estimate join — materialize once, not three times
      .persist()
    val bands = sig.select(col("doc_id"),
      explode(expr("sequence(0, 3)")).as("b"),
      col("mh"))
      .select(col("doc_id"),
        concat_ws(":", col("b"),
          expr("element_at(mh, 2*b + 1)"), expr("element_at(mh, 2*b + 2)"))
          .as("band_val"))
    // candidate pairs carry only ids through the shuffle; signatures are
    // re-attached from the cached sig table afterwards
    val pairs = bands.select(col("band_val"), col("doc_id").as("doc_a"))
      .join(bands.select(col("band_val"), col("doc_id").as("doc_b")),
        Seq("band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val out = pairs
      .join(sig.select(col("doc_id").as("doc_a"), col("mh").as("mh_a")), Seq("doc_a"))
      .join(sig.select(col("doc_id").as("doc_b"), col("mh").as("mh_b")), Seq("doc_b"))
      .withColumn("est_jaccard",
        expr("size(filter(sequence(1, 8), j -> element_at(mh_a, j) = element_at(mh_b, j)))") / 8.0)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .orderBy(col("est_jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(50)
    graft.core.CachePin.sealAndRelease(out, sig)
  }

  private val minHashLshSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM t
      |), mh AS (
      |  SELECT doc_id, list_transform(range(8), j -> list_min(list_transform(sh,
      |    s -> ((2*j + 1) * CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
      |          + 97*j + 13) % 2147483647))) AS mh
      |  FROM sh
      |), bands AS (
      |  SELECT doc_id, mh,
      |    b || ':' || mh[2*b + 1] || ':' || mh[2*b + 2] AS band_val
      |  FROM mh, (SELECT unnest(range(4)) AS b)
      |), pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.mh AS mh_a, b.mh AS mh_b
      |  FROM bands a JOIN bands b
      |    ON a.band_val = b.band_val AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b,
      |  len(list_filter(range(1, 9), j -> mh_a[j] = mh_b[j])) / 8.0 AS est_jaccard
      |FROM pairs
      |ORDER BY est_jaccard DESC, doc_a, doc_b LIMIT 50""".stripMargin

  /** Batch mirror of the STREAMING keep-first LSH dedup
    * (streaming/StreamingPipelines.dedupMinhashStream): same banding
    * CTEs as minHashLshSql, bucket winner = window MIN per band_val
    * (id-ordered replay makes arrival order = doc_id order, so the
    * stream's per-arrival verdicts equal the global window). */
  private[graft] val dedupMinhashStreamSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM t
      |), mh AS (
      |  SELECT doc_id, list_transform(range(8), j -> list_min(list_transform(sh,
      |    s -> ((2*j + 1) * CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
      |          + 97*j + 13) % 2147483647))) AS mh
      |  FROM sh
      |), bands AS (
      |  SELECT doc_id,
      |    b || ':' || mh[2*b + 1] || ':' || mh[2*b + 2] AS band_val
      |  FROM mh, (SELECT unnest(range(4)) AS b)
      |), w AS (
      |  SELECT doc_id, band_val,
      |    MIN(doc_id) OVER (PARTITION BY band_val) AS winner_id
      |  FROM bands
      |)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_bands,
      |  CAST(SUM(CASE WHEN winner_id = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
      |  CAST(SUM(CASE WHEN winner_id = doc_id THEN 1 ELSE 0 END) AS BIGINT)
      |    < CAST(COUNT(*) AS BIGINT) AS is_duplicate,
      |  COALESCE(MIN(CASE WHEN winner_id < doc_id THEN winner_id END),
      |    -1) AS dup_of
      |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------- prefix-filtering similarity join
  /** EXACT set-similarity self-join with prefix filtering (Chaudhuri et
    * al. 2006 / PPJoin, Xiao et al. 2008): the deterministic complement
    * to MinHash banding — NO false negatives at the threshold. Each doc's
    * distinct-token set is canonically ordered by (global frequency asc,
    * token asc); two sets with Jaccard ≥ t MUST share a token within
    * their first |x| − ⌈t·|x|⌉ + 1 tokens, so candidate generation is a
    * join on PREFIX tokens only — rare tokens first, which is what keeps
    * bucket sizes small under Zipf (the hot "the"-style tokens never
    * reach a prefix). Threshold t = 0.6 computed in pure integer
    * arithmetic (⌈3n/5⌉ = (3n+4) div 5) so both engines cut identical
    * prefixes; survivors are verified with the exact Jaccard. The join
    * runs over 3-gram SHINGLE sets (the MinHash queries' shingles) — on
    * this corpus's 31-word vocabulary raw token sets are degenerate
    * (nearly all pairs pass 0.6), while the shingle space is selective,
    * which is also the production choice. At 100 TB: one scan to count
    * frequencies, one shuffle on prefix shingle for candidates (bounded
    * by rare-shingle df), exact verify per candidate pair — the
    * all-pairs product never materializes. */
  private def prefixJoin(spark: SparkSession, dir: String): DataFrame =
    prefixScored(spark, dir)
      .filter(col("jaccard") >= 0.6)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("un"),
        col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  private val prefixCache =
    new scala.collection.concurrent.TrieMap[String, DataFrame]()

  /** The prefix-filter candidate pairs with exact Jaccard, pre-threshold
    * — shared by `dedup_prefix_join`, `dedup_minhash_eval`, and the
    * b-bit sketch eval (the ≥ 0.6 survivors are COMPLETE ground truth:
    * prefix filtering has no false negatives at the threshold). Built
    * once per (session, dataset) and localCheckpoint'd (round 14 — the
    * lshEdges pattern: three queries re-ran the identical freq-sort +
    * prefix self-join + exact-verify chain back to back; the pair table
    * is collision-bounded, so session residency is small). */
  private def prefixScored(spark: SparkSession, dir: String): DataFrame =
    prefixCache.getOrElseUpdate(
      s"${graft.core.SessionKeys.of(spark)}@$dir",
      prefixScoredBuild(spark, dir).localCheckpoint(true))

  private def prefixScoredBuild(spark: SparkSession, dir: String): DataFrame = {
    val tok = docs(spark, dir)
      .select(col("doc_id"), explode(expr(shingleExpr)).as("tok"))
    val freq = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val sorted = tok.join(freq, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(expr("transform(array_sort(collect_list(struct(df, tok))), s -> s.tok)")
        .as("stoks"))
      .withColumn("n", size(col("stoks")).cast("long"))
      // prefix length for Jaccard t=0.6: n - ceil(0.6n) + 1, all integer
      .withColumn("plen", col("n") - expr("(3 * n + 4) div 5") + 1)
    val pref = sorted.select(col("doc_id"), col("stoks"),
      explode(expr("slice(stoks, 1, cast(plen as int))")).as("ptok"))
    val cand = pref.select(col("ptok"), col("doc_id").as("doc_a"),
        col("stoks").as("ta"))
      .join(pref.select(col("ptok"), col("doc_id").as("doc_b"),
        col("stoks").as("tb")), Seq("ptok"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("ta"), col("tb"))
      .distinct()
    cand
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("un",
        size(col("ta")).cast("long") + size(col("tb")) - col("inter"))
      .withColumn("jaccard", col("inter") / col("un").cast("double"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("un"),
        col("jaccard"))
  }

  private val prefixJoinSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), tok AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS tok
      |  FROM t
      |), freq AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY tok
      |), sorted AS MATERIALIZED (
      |  SELECT doc_id, list(tok ORDER BY df, tok) AS stoks,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM tok JOIN freq USING (tok) GROUP BY doc_id
      |), pref AS MATERIALIZED (
      |  SELECT doc_id, stoks,
      |    unnest(stoks[:CAST(n - (3 * n + 4) // 5 + 1 AS INT)]) AS ptok
      |  FROM sorted
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.stoks AS ta, b.stoks AS tb
      |  FROM pref a JOIN pref b ON a.ptok = b.ptok AND a.doc_id < b.doc_id
      |), scored AS (
      |  SELECT doc_a, doc_b,
      |    CAST(len(list_intersect(ta, tb)) AS BIGINT) AS inter,
      |    CAST(len(ta) + len(tb) - len(list_intersect(ta, tb)) AS BIGINT) AS un
      |  FROM cand
      |)
      |SELECT doc_a, doc_b, inter, un,
      |  inter / CAST(un AS DOUBLE) AS jaccard
      |FROM scored WHERE inter / CAST(un AS DOUBLE) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------- LSH recall evaluation
  /** Measured precision/recall of MinHash-LSH banding against COMPLETE
    * exact ground truth — the dedup-side analogue of the ANN ladder's
    * recall gating: truth = the prefix-filter join's J ≥ 0.6 pairs
    * (prefix filtering has NO false negatives at the threshold, so
    * recall here is true recall, not recall-within-a-blocking), LSH
    * candidates = the 4-band × 2-row bucket pairs, true positives =
    * candidates whose exact shingle Jaccard clears the same threshold.
    * All counts exact; precision/recall are single divisions. Candidate
    * verification joins each LSH pair to its two shingle sets — bounded
    * by banding, never all-pairs. */
  private def minhashEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val truth = prefixScored(spark, dir).filter($"jaccard" >= 0.6)
    val d = docs(spark, dir)
    val cand = lshEdges(spark, dir)
    val sets = d.select($"doc_id", expr(shingleExpr).as("sh"))
    val candJ = cand
      .join(sets.select($"doc_id".as("a"), $"sh".as("sa")), Seq("a"))
      .join(sets.select($"doc_id".as("b"), $"sh".as("sb")), Seq("b"))
      .withColumn("inter", size(array_intersect($"sa", $"sb")).cast("long"))
      .withColumn("un", size($"sa").cast("long") + size($"sb") - $"inter")
      .withColumn("j", $"inter" / $"un".cast("double"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    candJ.agg(count(lit(1)).as("n_candidates"),
        sum(when($"j" >= 0.6, 1L).otherwise(0L)).as("n_tp"))
      .crossJoin(broadcast(nTruth))
      .select($"n_truth", $"n_candidates", $"n_tp",
        when($"n_candidates" > 0,
          $"n_tp".cast("double") / $"n_candidates".cast("double"))
          .otherwise(lit(0.0)).as("precision"),
        when($"n_truth" > 0,
          $"n_tp".cast("double") / $"n_truth".cast("double"))
          .otherwise(lit(1.0)).as("recall"))
  }

  private val minhashEvalSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM t
      |), mh AS (
      |  SELECT doc_id, list_transform(range(8), j -> list_min(list_transform(sh,
      |    s -> ((2*j + 1) * CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
      |          + 97*j + 13) % 2147483647))) AS mh
      |  FROM sh
      |), bands AS (
      |  SELECT doc_id,
      |    b || ':' || mh[2*b + 1] || ':' || mh[2*b + 2] AS band_val
      |  FROM mh, (SELECT unnest(range(4)) AS b)
      |), e AS MATERIALIZED (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM bands x JOIN bands y
      |    ON x.band_val = y.band_val AND x.doc_id < y.doc_id
      |), tok AS (
      |  SELECT doc_id, unnest(sh) AS tok FROM sh
      |), freq AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY tok
      |), sorted AS MATERIALIZED (
      |  SELECT doc_id, list(tok ORDER BY df, tok) AS stoks,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM tok JOIN freq USING (tok) GROUP BY doc_id
      |), pref AS MATERIALIZED (
      |  SELECT doc_id, stoks,
      |    unnest(stoks[:CAST(n - (3 * n + 4) // 5 + 1 AS INT)]) AS ptok
      |  FROM sorted
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.stoks AS ta, b.stoks AS tb
      |  FROM pref a JOIN pref b ON a.ptok = b.ptok AND a.doc_id < b.doc_id
      |), scored AS (
      |  SELECT doc_a, doc_b,
      |    CAST(len(list_intersect(ta, tb)) AS BIGINT) AS inter,
      |    CAST(len(ta) + len(tb) - len(list_intersect(ta, tb)) AS BIGINT) AS un
      |  FROM cand
      |), truth AS (
      |  SELECT doc_a, doc_b FROM scored
      |  WHERE inter / CAST(un AS DOUBLE) >= 0.6
      |), candj AS (
      |  SELECT e.a, e.b,
      |    CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS inter,
      |    CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))
      |      AS BIGINT) AS un
      |  FROM e JOIN sh sa ON e.a = sa.doc_id JOIN sh sb ON e.b = sb.doc_id
      |), agg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
      |    CAST(SUM(CASE WHEN inter / CAST(un AS DOUBLE) >= 0.6
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_tp
      |  FROM candj
      |), nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth)
      |SELECT n_truth, n_candidates, n_tp,
      |  CASE WHEN n_candidates > 0 THEN
      |    CAST(n_tp AS DOUBLE) / CAST(n_candidates AS DOUBLE)
      |  ELSE 0.0 END AS precision,
      |  CASE WHEN n_truth > 0 THEN
      |    CAST(n_tp AS DOUBLE) / CAST(n_truth AS DOUBLE)
      |  ELSE 1.0 END AS recall
      |FROM agg, nt""".stripMargin

  // ------------------------------------------------- MinHash LSH S-curve
  /** MEASURED band-collision rate vs the ANALYTIC LSH S-curve (round-12;
    * completes the dedup family's eval story: `dedup_minhash_eval`
    * measures recall at one threshold, this measures the THEORY the
    * banding parameters were chosen by). For every bounded
    * (lang, length-band) candidate pair — the `dedup_ngram_jaccard`
    * universe, never all-pairs — compute the exact shingle-set Jaccard J
    * (60-bit hashed sets, codegen'd two-pointer intersect), bucket it
    * into integer deciles (`LEAST(9, (10·inter) div un)` — pure BIGINT,
    * no float boundary), and per decile report the measured fraction of
    * pairs whose 4 LSH band values overlap next to the analytic
    * collision probability 1−(1−J²)⁴ for b=4 bands of r=2 rows.
    *
    * Exactness discipline: the analytic curve needs NO libm pow — J² is
    * one multiply and (1−J²)⁴ is two squarings, an identical IEEE
    * expression tree in both engines — and per-pair expectations are
    * quantized to micro-ints (FLOOR(p·10⁶), floor-then-cast because
    * DuckDB CAST rounds) BEFORE averaging: integer sums are
    * order-independent where a bare double mean is not. The per-decile
    * expected rate is then one exact-integer-over-integer division.
    *
    * Scale: one scan computes shingles + signature per doc (the md5 term,
    * embarrassingly parallel); pairs are bounded by the (lang, band)
    * bucket key exactly like dedup_ngram_jaccard (measured there: pair
    * volume, not hashing, dominates growth, and the bucket key caps it);
    * the rollup is ≤10 rows. */
  private def minhashScurve(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SortedIntersectCount.register(spark)
    // Signature build in RELATIONAL form (the probe-measured fix: the
    // withColumn chain of higher-order transforms ran INTERPRETED and
    // CollapseProject duplicated the shingle+md5 pipeline into every
    // consumer — 6 of the query's 9 s were md5 evaluated twice per
    // shingle inside lambdas). Explode shingles to rows, hash each ONCE
    // under whole-stage codegen, and rebuild the per-doc signature with
    // aggregates: sj = sorted collect_set of the 60-bit hashes, each
    // minhash slot = a plain MIN over the permuted 32-bit hashes
    // (min over rows ≡ array_min over the per-doc array, and duplicate
    // shingles cannot change a min or a set). Values are bit-identical
    // to the expression-constant form; only where they are computed
    // moved. This is also the 100 TB-friendlier shape: narrow rows
    // through one groupBy instead of giant per-row arrays in
    // interpreted lambdas.
    val rows = docs(spark, dir)
      .withColumn("band", expr("size(toks) div 10"))
      // ≥3 tokens ⟺ the shingle set is non-empty (the sub-shingle
      // guard in row form: such docs simply have no rows to group)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("lang"), col("band"),
        explode(expr(
          """transform(sequence(1, size(toks) - 2),
            |  i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
            |                 element_at(toks, i + 2)))""".stripMargin)).as("s"))
      .withColumn("h", md5(col("s").cast("binary")))
      .withColumn("h15", expr("cast(conv(substr(h, 1, 15), 16, 10) as bigint)"))
      .withColumn("h8", expr("cast(conv(substr(h, 1, 8), 16, 10) as bigint)"))
    val mhAggs = (0 until 8).map(j =>
      min(expr(s"((${2 * j + 1}) * h8 + ${97 * j} + 13) % 2147483647"))
        .as(s"mh${j + 1}"))
    val sig = rows
      .groupBy(col("doc_id"), col("lang"), col("band"))
      .agg(array_sort(collect_set(col("h15"))).as("sj"),
        mhAggs: _*)
      .withColumn("bands", array((0 until 4).map(b =>
        concat_ws(":", lit(b), col(s"mh${2 * b + 1}"), col(s"mh${2 * b + 2}"))): _*))
      .select(col("doc_id"), col("lang"), col("band"), col("sj"), col("bands"))
      .persist()
    val a = sig.select(col("lang"), col("band"), col("doc_id").as("doc_a"),
      col("sj").as("sj_a"), col("bands").as("bands_a"))
    val b = sig.select(col("lang"), col("band"), col("doc_id").as("doc_b"),
      col("sj").as("sj_b"), col("bands").as("bands_b"))
    val pairs = a.join(b, Seq("lang", "band"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter",
        expr("sorted_intersect_count(sj_a, sj_b)").cast("long"))
      .withColumn("un",
        (size(col("sj_a")) + size(col("sj_b"))).cast("long") - col("inter"))
      .withColumn("collided", arrays_overlap(col("bands_a"), col("bands_b")))
      .withColumn("decile", least(lit(9L), expr("(10 * inter) div un")))
      .withColumn("j", col("inter").cast("double") / col("un").cast("double"))
      // p = 1 − ((1−j·j)·(1−j·j))·((1−j·j)·(1−j·j)): the exact expression
      // tree mirrored in the oracle — IEEE *, − are deterministic, pow is
      // libm and is not
      .withColumn("q", lit(1.0) - col("j") * col("j"))
      .withColumn("p", lit(1.0) - (col("q") * col("q")) * (col("q") * col("q")))
      .withColumn("micro", floor(col("p") * lit(1000000.0)).cast("long"))
    val out = pairs.groupBy(col("decile"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(when(col("collided"), 1L).otherwise(0L)).as("n_collided"),
        sum(col("micro")).as("micro_sum"))
      .select(col("decile"), col("n_pairs"), col("n_collided"),
        (col("n_collided").cast("double") / col("n_pairs").cast("double"))
          .as("measured_rate"),
        col("micro_sum"),
        (col("micro_sum").cast("double") /
          (col("n_pairs") * lit(1000000L)).cast("double")).as("expected_rate"))
      .orderBy(col("decile"))
    graft.core.CachePin.sealAndRelease(out, sig)
  }

  private val minhashScurveSql =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |), s0 AS (
      |  SELECT doc_id, lang, len(toks) // 10 AS band,
      |    list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM t
      |), s1 AS (
      |  SELECT doc_id, lang, band,
      |    list_sort(list_distinct(list_transform(sh,
      |      s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)))) AS sj,
      |    list_transform(range(8), j -> list_min(list_transform(sh,
      |      s -> ((2*j + 1) * CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
      |            + 97*j + 13) % 2147483647))) AS mh
      |  FROM s0 WHERE len(sh) > 0
      |), s2 AS MATERIALIZED (
      |  SELECT doc_id, lang, band, sj,
      |    list_transform(range(4),
      |      b -> b || ':' || mh[2*b + 1] || ':' || mh[2*b + 2]) AS bands
      |  FROM s1
      |), pairs AS (
      |  SELECT
      |    CAST(len(list_filter(x.sj, v -> list_contains(y.sj, v))) AS BIGINT)
      |      AS inter,
      |    CAST(len(x.sj) + len(y.sj) AS BIGINT) AS sab,
      |    len(list_filter(x.bands, v -> list_contains(y.bands, v))) > 0
      |      AS collided
      |  FROM s2 x JOIN s2 y
      |    ON x.lang = y.lang AND x.band = y.band AND x.doc_id < y.doc_id
      |), sc AS (
      |  SELECT collided,
      |    LEAST(CAST(9 AS BIGINT), CAST((10 * inter) // (sab - inter) AS BIGINT))
      |      AS decile,
      |    CAST(inter AS DOUBLE) / CAST(sab - inter AS DOUBLE) AS j
      |  FROM pairs
      |), e AS (
      |  SELECT decile, collided,
      |    CAST(FLOOR((1.0 - ((1.0 - j*j)*(1.0 - j*j))*((1.0 - j*j)*(1.0 - j*j)))
      |      * 1000000.0) AS BIGINT) AS micro
      |  FROM sc
      |)
      |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(CASE WHEN collided THEN 1 ELSE 0 END) AS BIGINT) AS n_collided,
      |  CAST(SUM(CASE WHEN collided THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS measured_rate,
      |  CAST(SUM(micro) AS BIGINT) AS micro_sum,
      |  CAST(SUM(micro) AS DOUBLE)
      |    / CAST(CAST(COUNT(*) AS BIGINT) * 1000000 AS DOUBLE) AS expected_rate
      |FROM e GROUP BY decile ORDER BY decile""".stripMargin

  // ---------------------------------------------------- triangle counting
  /** Triangle counting over the near-dup candidate graph (node = doc,
    * edge = pair sharing ≥ 1 LSH band bucket): the Suri–Vassilvitskii
    * MapReduce join-plan — edges ORIENTED a<b so each triangle
    * materializes exactly once as e(a,b) ⋈ e(b,c) ⋈ e(a,c) with a<b<c.
    * Candidate edges come from the same banding core as dedup_minhash_lsh
    * (bucket-wise, never all-pairs); both triangle joins shuffle on a
    * single doc-id key. Duplicate clusters of size k show up as
    * C(k,3)-triangle cliques — triangle density is the classic
    * cluster-coherence check on a dedup graph. Output: per-doc triangle
    * participation. */
  private def triangles(spark: SparkSession, dir: String): DataFrame = {
    val e = lshEdges(spark, dir)
    val tri = e.select(col("a"), col("b"))
      .join(e.select(col("a").as("b"), col("b").as("c")), Seq("b"))
      .join(e.select(col("a"), col("b").as("c"), lit(1).as("closed")),
        Seq("a", "c"))
      .select(col("a"), col("b"), col("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("doc_id"))
  }

  private val trianglesSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM t
      |), mh AS (
      |  SELECT doc_id, list_transform(range(8), j -> list_min(list_transform(sh,
      |    s -> ((2*j + 1) * CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
      |          + 97*j + 13) % 2147483647))) AS mh
      |  FROM sh
      |), bands AS (
      |  SELECT doc_id,
      |    b || ':' || mh[2*b + 1] || ':' || mh[2*b + 2] AS band_val
      |  FROM mh, (SELECT unnest(range(4)) AS b)
      |), e AS MATERIALIZED (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM bands x JOIN bands y
      |    ON x.band_val = y.band_val AND x.doc_id < y.doc_id
      |), tri AS (
      |  SELECT e1.a, e1.b, e2.b AS c
      |  FROM e e1 JOIN e e2 ON e1.b = e2.a
      |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
      |)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
      |  SELECT a AS doc_id FROM tri
      |  UNION ALL SELECT b FROM tri
      |  UNION ALL SELECT c FROM tri)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- SimHash
  /** 32-bit SimHash per document over md5-derived token hashes: majority
    * vote per bit position. Near-dup docs differ in few bits (Hamming). */
  /** The single-element-transform wrapper is a let-binding: `si` is bound
    * once as a lambda variable, so the md5 token hashing runs once per
    * document instead of once per bit (32x less hashing; measured 38s ->
    * ~1s for the pair query at sf0.1). */
  private[queries] val simhashExpr =
    """element_at(transform(
        array(transform(toks, t -> cast(conv(substr(md5(cast(t as binary)), 1, 8), 16, 10) as bigint))),
        si -> aggregate(transform(sequence(0, 31), b ->
          case when 2 * size(filter(si, x -> (x div cast(pow(2, b) as bigint)) % 2 = 1)) > size(si)
               then cast(pow(2, b) as bigint) else 0L end),
        0L, (acc, x) -> acc + x)), 1)"""

  /** The per-doc simhash frame (doc_id, lang, simhash, bucket) — built
    * ONCE per (session, dataset) and localCheckpoint'd (round 14, the
    * lshEdges pattern): five queries (`dedup_simhash`,
    * `dedup_simhash_pairs`, `dedup_clusters`→`dedup_keep_best`,
    * `graph_modularity`, `graph_conductance`) each recomputed the
    * identical per-token-md5 signature pass and most re-ran the same
    * bucket self-join on top of it. */
  private val simsCache =
    new scala.collection.concurrent.TrieMap[String, DataFrame]()

  private[graft] def simhashFrame(spark: SparkSession, dir: String): DataFrame =
    simsCache.getOrElseUpdate(
      s"sims:${graft.core.SessionKeys.of(spark)}@$dir",
      docs(spark, dir)
        .select(col("doc_id"), col("lang"), expr(simhashExpr).as("simhash"))
        .withColumn("bucket", expr("simhash div 16777216"))
        .localCheckpoint(true))

  /** The simhash near-dup EDGE SET (same top-8-bit bucket, hamming ≤ 6)
    * with both endpoints' languages — the identical edge table
    * `dedup_clusters`, `graph_modularity` and `graph_conductance` each
    * built privately. Cached like [[simhashFrame]]. */
  private[graft] def simhashLangEdges(spark: SparkSession, dir: String)
      : DataFrame =
    simsCache.getOrElseUpdate(
      s"simedges:${graft.core.SessionKeys.of(spark)}@$dir", {
        graft.functions.HammingDistance.register(spark)
        val sims = simhashFrame(spark, dir)
        val a = sims.select(col("bucket"), col("doc_id").as("src"),
          col("lang").as("lang_src"), col("simhash").as("sh_a"))
        val b = sims.select(col("bucket"), col("doc_id").as("dst"),
          col("lang").as("lang_dst"), col("simhash").as("sh_b"))
        a.join(b, Seq("bucket"))
          .filter(col("src") < col("dst"))
          .filter(expr("hamming_distance(sh_a, sh_b)") <= 6)
          .select(col("src"), col("dst"), col("lang_src"), col("lang_dst"))
          .localCheckpoint(true)
      })

  private def simHash(spark: SparkSession, dir: String): DataFrame =
    simhashFrame(spark, dir).select(col("doc_id"), col("simhash"))
      .orderBy(col("doc_id"))

  /** SimHash candidate pairs: bucket on the top 8 signature bits, rank by
    * Hamming distance computed with the NATIVE codegen'd
    * [[graft.functions.HammingDistance]] expression (popcount of xor stays
    * inside whole-stage codegen; a UDF would box per pair). */
  private def simHashPairs(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.HammingDistance.register(spark)
    // both sides of the self-join read the shared session-cached
    // signature frame (round 14) — already localCheckpoint'd, no pin
    val sims = simhashFrame(spark, dir)
    val a = sims.select(col("bucket"), col("doc_id").as("doc_a"),
      col("simhash").as("sh_a"))
    val b = sims.select(col("bucket"), col("doc_id").as("doc_b"),
      col("simhash").as("sh_b"))
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("hamming_distance(sh_a, sh_b)").cast("long"))
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      .limit(50)
  }

  private val simHashPairsSql =
    """WITH t AS (
      |  SELECT doc_id, list_transform(string_split_regex(trim(text), '\s+'),
      |    s -> CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)) AS si
      |  FROM documents
      |), sim AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(32), b ->
      |      CASE WHEN 2 * len(list_filter(si, x -> (x // CAST(power(2, b) AS BIGINT)) % 2 = 1)) > len(si)
      |           THEN CAST(power(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
      |      (acc, x) -> acc + x) AS simhash
      |  FROM t
      |), b AS (
      |  SELECT doc_id, simhash, simhash // 16777216 AS bucket FROM sim)
      |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.simhash, c.simhash)) AS BIGINT) AS hamming
      |FROM b a JOIN b c ON a.bucket = c.bucket AND a.doc_id < c.doc_id
      |ORDER BY hamming, doc_a, doc_b LIMIT 50""".stripMargin

  /** Near-dup CLUSTERS: SimHash candidate edges (same top-8-bit bucket,
    * hamming <= 6) merged into connected components
    * (operators/ConnectedComponents, min-label propagation), sized — the
    * pairs->groups step of a dedup pipeline, where the component label
    * (smallest doc_id) is the canonical survivor. The DuckDB oracle
    * computes the same fixpoint with a recursive CTE. */
  private val clusterCache =
    new scala.collection.concurrent.TrieMap[String, DataFrame]()

  /** The simhash connected-components frame (cluster_id, doc_id,
    * cluster_size) — built ONCE per (session, dataset) and
    * localCheckpoint'd (the [[lshEdges]] pattern, round 12): both
    * `dedup_clusters` and `dedup_keep_best` consume the identical
    * component build, and the iterative CC walk was the whole cost of
    * each. */
  private def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    clusterCache.getOrElseUpdate(
      s"${graft.core.SessionKeys.of(spark)}@$dir", {
        // the shared edge set (round 14): same bucket join, same ≤6 cut
        val edges = simhashLangEdges(spark, dir)
          .select(col("src"), col("dst"))
        val comp = graft.operators.ConnectedComponents.components(edges)
        val sizes = comp.groupBy(col("comp"))
          .agg(count(lit(1)).as("cluster_size"))
        comp.join(sizes, Seq("comp"))
          .select(col("comp").as("cluster_id"), col("id").as("doc_id"),
            col("cluster_size"))
          .orderBy(col("cluster_id"), col("doc_id"))
          .localCheckpoint(true)
      })

  private val dedupClustersSql =
    """WITH RECURSIVE t AS (
      |  SELECT doc_id, list_transform(string_split_regex(trim(text), '\s+'),
      |    s -> CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)) AS si
      |  FROM documents
      |), sim AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(32), b ->
      |      CASE WHEN 2 * len(list_filter(si, x -> (x // CAST(power(2, b) AS BIGINT)) % 2 = 1)) > len(si)
      |           THEN CAST(power(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
      |      (acc, x) -> acc + x) AS simhash
      |  FROM t
      |), bkt AS (
      |  SELECT doc_id, simhash, simhash // 16777216 AS bucket FROM sim
      |), edges AS (
      |  SELECT a.doc_id AS src, c.doc_id AS dst
      |  FROM bkt a JOIN bkt c ON a.bucket = c.bucket AND a.doc_id < c.doc_id
      |  WHERE bit_count(xor(a.simhash, c.simhash)) <= 6
      |), sym AS (
      |  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
      |), reach AS (
      |  SELECT DISTINCT src AS id, src AS comp FROM sym
      |  UNION
      |  SELECT s.src AS id, r.comp FROM sym s JOIN reach r ON s.dst = r.id
      |), comp AS (
      |  SELECT id, MIN(comp) AS comp FROM reach GROUP BY id
      |)
      |SELECT c.comp AS cluster_id, c.id AS doc_id, n.cluster_size
      |FROM comp c JOIN (
      |  SELECT comp, count(*) AS cluster_size FROM comp GROUP BY comp) n
      |  ON c.comp = n.comp
      |ORDER BY cluster_id, doc_id""".stripMargin

  private val simHashSql =
    """WITH t AS (
      |  SELECT doc_id, list_transform(string_split_regex(trim(text), '\s+'),
      |    s -> CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)) AS si
      |  FROM documents)
      |SELECT doc_id,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(32), b ->
      |    CASE WHEN 2 * len(list_filter(si, x -> (x // CAST(power(2, b) AS BIGINT)) % 2 = 1)) > len(si)
      |         THEN CAST(power(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
      |    (acc, x) -> acc + x) AS simhash
      |FROM t ORDER BY doc_id""".stripMargin

  // ----------------------------------------- keep-best cluster canonical
  /** Quality-argmax canonical selection per near-dup cluster (round 12 —
    * SemDeDup/RefinedWeb practice: when a duplicate cluster collapses to
    * one survivor, keep the HIGHEST-QUALITY member, not the smallest id;
    * min-id is an arbitrary tie-break, quality-argmax is the one that
    * improves the training corpus). Clusters come from the simhash
    * connected components ([[dedupClusters]]' chain), quality from the
    * shared Gopher-style score ([[withQualityCols]] — the same doubles
    * text_quality_score grades, so the cross-engine ranking is exact);
    * winner = row_number() over (quality DESC, doc_id) = 1. The join is
    * cluster-member-sized (docs in no cluster are untouched survivors by
    * definition and are not re-listed). */
  private def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val clusters = dedupClusters(spark, dir)
    val q = withQualityCols(docs(spark, dir))
      .select(col("doc_id"), col("quality_score"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    clusters.join(q, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .select(col("cluster_id"), col("doc_id"), col("cluster_size"),
        col("quality_score"), (col("rk") === 1).as("keep"))
      .orderBy(col("cluster_id"), col("doc_id"))
  }

  private val dedupKeepBestSql =
    s"""WITH c AS (SELECT * FROM ($dedupClustersSql)),
       |q AS (SELECT doc_id, quality_score FROM ($qualitySql))
       |SELECT c.cluster_id, c.doc_id, c.cluster_size, q.quality_score,
       |  (row_number() OVER (PARTITION BY c.cluster_id
       |     ORDER BY q.quality_score DESC, c.doc_id) = 1) AS keep
       |FROM c JOIN q USING (doc_id)
       |ORDER BY c.cluster_id, c.doc_id""".stripMargin

  // ------------------------------------------- paragraph-granular near-dup
  /** Paragraph-granular near-dedup (round 13, verdict r12 #6 — Lee et
    * al. 2022 dedup at BOTH document and passage level; D4/RefinedWeb
    * carry a per-doc duplication-fraction signal): documents split into
    * fixed 30-token paragraphs (the synthetic corpus has no newline
    * structure, so the block split IS the passage boundary — documented,
    * deterministic), each paragraph MinHash-banded with the SAME 4×2
    * banding as the doc-level family ([[fuzzySigRows]] over the
    * paragraph text), candidates from the band equi-join (never
    * paragraph²), confirmed at exact shingle Jaccard ≥ 0.5 (the integer
    * test 3·inter ≥ |a|+|b|), keep-first by (doc_id, paragraph index).
    * Output: per-doc paragraph counts + the duplication fraction (the
    * D4 signal a curation pipeline trains its doc-level gate on).
    * Honest corpus note: this corpus duplicates whole documents, so
    * fractions land at 0 or 1 — partially-copied docs would land
    * between. Scale: paragraphs ≈ tokens/30 rows, banded join, window-
    * free keep-first (dup = any confirmed earlier match). Sub-shingle
    * paragraphs (a <3-token tail block) emit no bands and are counted
    * as unique, like every sub-shingle doc in the family. pkey packs
    * (doc, paragraph) as doc_id·1e5 + idx — exact for docs up to 100k
    * paragraphs (3M tokens) and ids up to ~9e13; a corpus beyond either
    * bound swaps the packed key for a struct key, nothing else moves. */
  private def dedupParagraph(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SortedIntersectCount.register(spark)
    val paras = docs(spark, dir)
      .select(col("doc_id"),
        explode(expr(
          "sequence(0, greatest((size(toks) + 29) div 30, 1) - 1)")).as("g"),
        col("toks"))
      .select(col("doc_id"),
        (col("doc_id") * 100000 + col("g")).as("pkey"),
        expr("slice(toks, cast(g * 30 + 1 as int), 30)").as("ptoks"))
    val sig = fuzzySigRows(
        paras.filter(size(col("ptoks")) >= 3)
          .select(col("pkey").as("doc_id"),
            concat_ws(" ", col("ptoks")).as("text")))
      .select(col("doc_id").as("pkey"), col("sj"), col("bands"))
      .persist()
    val bandRows = sig.select(col("pkey"), explode(col("bands")).as("band_val"))
    val cand = bandRows.select(col("band_val"), col("pkey").as("ka"))
      .join(bandRows.select(col("band_val"), col("pkey").as("kb")),
        Seq("band_val"))
      .filter(col("ka") < col("kb"))
      .select(col("ka"), col("kb")).distinct()
    val dup = cand
      .join(sig.select(col("pkey").as("ka"), col("sj").as("sa")), Seq("ka"))
      .join(sig.select(col("pkey").as("kb"), col("sj").as("sb")), Seq("kb"))
      .filter(expr("sorted_intersect_count(sa, sb)") * 3 >=
        size(col("sa")).cast("long") + size(col("sb")))
      .select(col("kb").as("pkey")).distinct()
      .withColumn("isdup", lit(1L))
    val out = paras.join(dup, Seq("pkey"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_paras"),
        sum(coalesce(col("isdup"), lit(0L))).cast("long").as("n_dup_paras"))
      .withColumn("dup_fraction",
        col("n_dup_paras").cast("double") / col("n_paras"))
      .orderBy(col("doc_id"))
    graft.core.CachePin.sealAndRelease(out, sig)
  }

  private val dedupParagraphSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), par AS MATERIALIZED (
      |  -- paragraph-index fan-out bound derived from the corpus itself
      |  -- (round-14 advice: a fixed range(64) silently under-split any
      |  -- regenerated corpus with docs > 1920 tokens; the Spark side's
      |  -- sequence() is unbounded)
      |  SELECT doc_id, doc_id * 100000 + g AS pkey,
      |    toks[CAST(g*30+1 AS INT):CAST(g*30+30 AS INT)] AS ptoks
      |  FROM t, (SELECT unnest(range((
      |      SELECT MAX(greatest((len(toks) + 29) // 30, 1)) FROM t))) AS g)
      |  WHERE g < greatest((len(toks) + 29) // 30, 1)
      |), psh AS (
      |  SELECT pkey, list_distinct(list_transform(range(1, len(ptoks) - 1),
      |    i -> ptoks[i] || ' ' || ptoks[i+1] || ' ' || ptoks[i+2])) AS sh
      |  FROM par WHERE len(ptoks) >= 3
      |), sig AS MATERIALIZED (
      |  SELECT pkey,
      |    list_sort(list_distinct(list_transform(sh,
      |      s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)))) AS sj,
      |    list_transform(range(8), j -> list_min(list_transform(sh,
      |      s -> ((2*j + 1) * CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
      |            + 97*j + 13) % 2147483647))) AS mh
      |  FROM psh
      |), bands AS MATERIALIZED (
      |  SELECT pkey, b || ':' || mh[2*b + 1] || ':' || mh[2*b + 2] AS band_val
      |  FROM sig, (SELECT unnest(range(4)) AS b)
      |), cand AS (
      |  SELECT DISTINCT a.pkey AS ka, b.pkey AS kb
      |  FROM bands a JOIN bands b
      |    ON a.band_val = b.band_val AND a.pkey < b.pkey
      |), dup AS (
      |  SELECT DISTINCT c.kb AS pkey
      |  FROM cand c JOIN sig x ON x.pkey = c.ka JOIN sig y ON y.pkey = c.kb
      |  WHERE 3 * len(list_intersect(x.sj, y.sj)) >= len(x.sj) + len(y.sj)
      |)
      |SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras,
      |  CAST(COUNT(d.pkey) AS BIGINT) AS n_dup_paras,
      |  CAST(COUNT(d.pkey) AS DOUBLE) / COUNT(*) AS dup_fraction
      |FROM par p LEFT JOIN dup d USING (pkey)
      |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin

  // --------------------------------------- incremental new-vs-corpus dedup
  /** Cross-snapshot incremental dedup (round 13, verdict r12 #7 — the
    * production shape: a NEW crawl snapshot dedups against the EXISTING
    * corpus without ever re-pairing the old corpus with itself). Split:
    * doc_id % 3 == 0 is the new snapshot, the rest the accepted corpus.
    * The band join probes new-side bands against the WHOLE band index
    * but keeps only pairs whose other side ranks EARLIER — rank =
    * (is_new, doc_id), i.e. every corpus doc precedes every new doc
    * (arrival order), new docs order among themselves by id — so
    * old×old pairs never materialize and the work scales with |new|'s
    * band posts, not |corpus|² (ScaleCheck `dedup_incremental`
    * measures it). A new doc is a duplicate iff some banded candidate
    * confirms at exact shingle Jaccard ≥ 0.5. The oracle runs the
    * FULL-corpus keep-first dedup under the same rank order and
    * restricts to new docs — equality proves the asymmetric join
    * changes nothing about the verdicts, only the cost. */
  private def dedupIncrementalBands(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.SortedIntersectCount.register(spark)
    // shared session-cached corpus signature frame (round 14) — already
    // localCheckpoint'd, no per-invocation md5 pass, no pin to release
    val sig = corpusSigFrame(spark, dir)
    val bandRows = sig.select(col("doc_id"), explode(col("bands")).as("band_val"))
    val cand = bandRows.filter(col("doc_id") % 3 === 0)
      .select(col("band_val"), col("doc_id").as("n"))
      .join(bandRows.select(col("band_val"), col("doc_id").as("o")),
        Seq("band_val"))
      // rank(other) < rank(new): any corpus doc, or an earlier new doc
      .filter(col("o") % 3 =!= 0 || col("o") < col("n"))
      .select(col("n"), col("o")).distinct()
    val matches = cand
      .join(sig.select(col("doc_id").as("n"), col("sj").as("sa")), Seq("n"))
      .join(sig.select(col("doc_id").as("o"), col("sj").as("sb")), Seq("o"))
      .withColumn("conf",
        when(expr("sorted_intersect_count(sa, sb)") * 3 >=
          size(col("sa")).cast("long") + size(col("sb")), 1L).otherwise(0L))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("n_candidates"), sum(col("conf")).as("n_matches"))
    docs(spark, dir).filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"))
      .join(matches.withColumnRenamed("n", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_matches"), lit(0L)).cast("long").as("n_matches"),
        (coalesce(col("n_matches"), lit(0L)) > 0).as("is_dup"))
      .orderBy(col("doc_id"))
  }

  /** The oracle is the FULL-corpus pairing (old×old included) under the
    * (is_new, doc_id) rank, restricted to new docs — deliberately NOT
    * the incremental join, so a bug in the asymmetric filter (e.g.
    * dropping new-vs-earlier-new pairs) fails the hash. */
  private[graft] val dedupIncrementalBandsSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
      |), sh AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM t
      |), sig AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_sort(list_distinct(list_transform(sh,
      |      s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)))) AS sj,
      |    list_transform(range(8), j -> list_min(list_transform(sh,
      |      s -> ((2*j + 1) * CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)
      |            + 97*j + 13) % 2147483647))) AS mh
      |  FROM sh
      |), bands AS MATERIALIZED (
      |  SELECT doc_id, b || ':' || mh[2*b + 1] || ':' || mh[2*b + 2] AS band_val
      |  FROM sig, (SELECT unnest(range(4)) AS b)
      |), cand AS (
      |  -- EVERY doc's rank-earlier candidates (old docs included), so a
      |  -- Spark-side filter bug cannot hide: the restriction to new docs
      |  -- happens only in the final projection
      |  SELECT DISTINCT a.doc_id AS n, b.doc_id AS o
      |  FROM bands a JOIN bands b ON a.band_val = b.band_val
      |  WHERE (CASE WHEN b.doc_id % 3 = 0 THEN 1 ELSE 0 END, b.doc_id)
      |      < (CASE WHEN a.doc_id % 3 = 0 THEN 1 ELSE 0 END, a.doc_id)
      |), m AS (
      |  SELECT c.n, CAST(COUNT(*) AS BIGINT) AS n_candidates,
      |    CAST(SUM(CASE WHEN 3 * len(list_intersect(x.sj, y.sj))
      |          >= len(x.sj) + len(y.sj) THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_matches
      |  FROM cand c JOIN sig x ON x.doc_id = c.n JOIN sig y ON y.doc_id = c.o
      |  GROUP BY c.n
      |)
      |SELECT d.doc_id,
      |  COALESCE(m.n_candidates, 0) AS n_candidates,
      |  COALESCE(m.n_matches, 0) AS n_matches,
      |  COALESCE(m.n_matches, 0) > 0 AS is_dup
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
      |LEFT JOIN m ON m.n = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------- BPE-ish tokenization
  /** Sub-word ("BPE-ish") tokenization via greedy regex chunking: both
    * engines chunk [a-z]{1,4} left-to-right identically. Reports sub-token
    * counts and the subword fan-out per whitespace token. */
  private def bpeTokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(col("toks")).cast("long").as("n_tokens"),
      expr("size(regexp_extract_all(text, '[a-z]{1,4}', 0))").cast("long").as("n_subtokens"),
      expr("size(array_distinct(regexp_extract_all(text, '[a-z]{1,4}', 0)))")
        .cast("long").as("n_unique_subtokens"),
      (expr("size(regexp_extract_all(text, '[a-z]{1,4}', 0))") /
        size(col("toks")).cast("double")).as("subtokens_per_token"))
      .orderBy(col("doc_id"))

  private val bpeTokensSql =
    """SELECT doc_id,
      |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
      |  len(regexp_extract_all(text, '[a-z]{1,4}')) AS n_subtokens,
      |  len(list_distinct(regexp_extract_all(text, '[a-z]{1,4}'))) AS n_unique_subtokens,
      |  len(regexp_extract_all(text, '[a-z]{1,4}'))
      |    / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS subtokens_per_token
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- salient terms
  /** Per-document salient terms: tf × rational idf, top-3 per doc — the
    * keyword/topic-extraction pass of a corpus pipeline (and the shape of
    * TF-IDF featurization for downstream clustering). The idf is BM25's
    * (N - df + 0.5)/(df + 0.5) WITHOUT the log: the log is libm-dependent
    * (Spark uses java.lang.Math, DuckDB uses C libm, last-ulp divergence)
    * while the rational form is two IEEE ops, bit-identical cross-engine.
    * Ranking is order-isomorphic to the logged form, so top-k is the same.
    *
    * Scale shape: tf = one shuffle on (doc, term); df = one shuffle on
    * term (map-side partial counts); the df join back is a shuffle join on
    * term (df table ∝ vocabulary — too big to broadcast at corpus scale);
    * top-3 is a per-doc window, partition-parallel. No global sort. */
  private def salientTerms(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val tf = d.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast("double") *
          ((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"),
        round(col("score"), 6).as("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  private val salientTermsSql =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM t GROUP BY doc_id, term
      |), df AS (
      |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
      |), n AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      |), scored AS (
      |  SELECT doc_id, term, tf, df,
      |    CAST(tf AS DOUBLE) *
      |      ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
      |       (CAST(df AS DOUBLE) + 0.5)) AS score
      |  FROM tf JOIN df USING (term), n
      |), ranked AS (
      |  SELECT doc_id, term, tf, df, score,
      |    CAST(row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, term) AS BIGINT) AS rnk
      |  FROM scored)
      |SELECT doc_id, rnk, term, tf, df, ROUND(score, 6) AS score
      |FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  // ------------------------------------------------------ BM25 retrieval
  /** Full-text BM25 retrieval (Robertson/Sparck Jones; k1 = 1.2,
    * b = 0.75): top-20 documents for a fixed keyword query — the
    * retrieval pass of a data pipeline (deduplication forensics, corpus
    * search, RAG indexing). Same rational idf as [[salientTerms]] (no
    * log — libm-dependent; the rational form is bit-identical
    * cross-engine and order-isomorphic). Per-doc scores fold
    * SEQUENTIALLY over term-sorted per-term contributions (the
    * small-double-reduction rule — a bare SUM's order differs between
    * engines).
    *
    * Scale shape: a pre-explode `arrays_overlap` guard drops documents
    * containing NO query term before any row multiplication (the
    * whole-row skip an inverted index would give; the IN filter then
    * prunes the surviving docs' exploded tokens); tf is one shuffle on
    * (doc, term) bounded by |Q| terms per doc; df and corpus stats are
    * tiny aggregates broadcast back; the final top-20 by (score,
    * doc_id) is a TakeOrdered, not a global sort. */
  private val bm25K1 = 1.2
  private val bm25B = 0.75
  private val bm25Query = Seq("spark", "stream", "join", "query",
    "vector", "filter")

  private def bm25Search(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("dl", size(col("toks")).cast("long"))
    val stats = d.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
    val tf = d
      .filter(arrays_overlap(col("toks"),
        array(bm25Query.map(lit): _*)))
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(bm25Query: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("tot").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      .withColumn("s",
        col("idf") * col("tf").cast("double") * lit(bm25K1 + 1.0) /
          (col("tf").cast("double") + lit(bm25K1) *
            (lit(1.0 - bm25B) + lit(bm25B) *
              col("dl").cast("double") / col("avgdl"))))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        expr("""aggregate(array_sort(collect_list(struct(term, s))),
          |  cast(0.0 as double), (acc, x) -> acc + x.s)""".stripMargin)
          .as("score0"))
      .select(col("doc_id"), col("n_terms"),
        round(col("score0"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
  }

  /** Shared CTE chain producing `cand(doc_id, n_terms, score)` — the
    * BM25 top-20 — so the MMR oracle reuses the scorer verbatim. */
  private val bm25CandCtes = {
    val q = bm25Query.map(t => s"'$t'").mkString(", ")
    s"""d AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents
       |), dd AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM d
       |), st AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(dl) AS BIGINT) AS tot FROM dd
       |), tf AS (
       |  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM dd)
       |  WHERE term IN ($q) GROUP BY doc_id, dl, term
       |), df AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
       |), bscored AS (
       |  SELECT tf.doc_id, tf.term,
       |    ((CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
       |      / (CAST(df.df AS DOUBLE) + 0.5))
       |    * CAST(tf.tf AS DOUBLE) * ${bm25K1 + 1.0}
       |    / (CAST(tf.tf AS DOUBLE) + $bm25K1 *
       |        (${1.0 - bm25B} + $bm25B * CAST(tf.dl AS DOUBLE)
       |          / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS s
       |  FROM tf JOIN df USING (term), st
       |), cand AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
       |    ROUND(list_reduce(list_prepend(0.0, list(s ORDER BY term)),
       |      (acc, x) -> acc + x), 6) AS score
       |  FROM bscored GROUP BY doc_id
       |  ORDER BY score DESC, doc_id LIMIT 20
       |)""".stripMargin
  }

  private val bm25SearchSql =
    s"""WITH $bm25CandCtes
       |SELECT doc_id, n_terms, score FROM cand
       |ORDER BY score DESC, doc_id""".stripMargin

  // --------------------------------------------------- MMR rerank
  /** Maximal Marginal Relevance diversified rerank of the BM25 top-20
    * (Carbonell–Goldstein 1998): greedily select 5 results maximizing
    * λ·relevance − (1−λ)·max-similarity-to-selected (λ = 0.7),
    * similarity = token-set Jaccard. The greedy argmax chain is
    * inherently sequential over a TOP-K-BOUNDED candidate set, so the
    * selection runs on the driver over the collected 20 rows — the
    * serving-side rerank shape, legitimate because candidates are
    * bounded by construction, never corpus-sized. Every score is a
    * shared double formula (0.7·s − 0.3·m; Jaccard = one division of
    * exact integers), so the oracle's 5 unrolled argmax rounds walk the
    * identical trajectory. */
  private def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cands = bm25Search(spark, dir).select($"doc_id", $"score")
    val toksets = docs(spark, dir)
      .select($"doc_id", array_distinct($"toks").as("ts"))
    val rows = cands.join(toksets, Seq("doc_id"))
      .select($"doc_id", $"score", $"ts")
      .collect() // bounded: top-20 candidates by construction
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[String](2).toSet))
    def jac(a: Set[String], b: Set[String]): Double =
      (a & b).size.toDouble / (a | b).size.toDouble
    var remaining = rows.toList
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double, Double, Double)]
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Set[String])]
    for (k <- 1 to 5) {
      val scored = remaining.map { case (id, s, t) =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(sel => jac(t, sel._2)).max
        (id, s, t, maxSim, 0.7 * s - 0.3 * maxSim)
      }
      val pick = scored.reduceLeft { (p, q) =>
        if (q._5 > p._5 || (q._5 == p._5 && q._1 < p._1)) q else p
      }
      out += ((k.toLong, pick._1, pick._2, pick._4, pick._5))
      selected += ((pick._1, pick._3))
      remaining = remaining.filterNot(_._1 == pick._1)
    }
    spark.createDataFrame(out.toSeq)
      .toDF("rank", "doc_id", "bm25_score", "max_sim", "mmr_score")
      .orderBy($"rank")
  }

  private val mmrSql = {
    // 5 unrolled greedy rounds; selection state selN accumulates by
    // UNION ALL; max_sim over pairwise candidate Jaccard (unnest+join —
    // never a nested lambda, per the DuckDB 1.0.0 mis-binding rule)
    val rounds = (1 to 5).map { k =>
      s"""r$k AS (
         |  SELECT doc_id, score, max_sim,
         |    0.7 * score - 0.3 * max_sim AS mmr
         |  FROM (
         |    SELECT c.doc_id, c.score,
         |      COALESCE(MAX(q.sim), CAST(0 AS DOUBLE)) AS max_sim
         |    FROM cand c
         |    LEFT JOIN (SELECT s.da, s.sim FROM sim s
         |               JOIN sel${k - 1} p ON s.db = p.doc_id) q
         |      ON q.da = c.doc_id
         |    WHERE c.doc_id NOT IN (SELECT doc_id FROM sel${k - 1})
         |    GROUP BY c.doc_id, c.score)
         |  ORDER BY mmr DESC, doc_id LIMIT 1
         |), sel$k AS (
         |  SELECT doc_id FROM sel${k - 1}
         |  UNION ALL SELECT doc_id FROM r$k)""".stripMargin
    }.mkString(", ")
    s"""WITH $bm25CandCtes,
       |ts AS (
       |  SELECT doc_id, list_distinct(toks) AS ts FROM d
       |), ct AS (
       |  SELECT c.doc_id, unnest(ts.ts) AS tok
       |  FROM cand c JOIN ts ON c.doc_id = ts.doc_id
       |), sz AS (
       |  SELECT doc_id, count(*) AS n FROM ct GROUP BY 1
       |), iv AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
       |  FROM ct a JOIN ct b ON a.tok = b.tok AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2
       |), sim AS (
       |  SELECT da, db,
       |    CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS sim
       |  FROM iv
       |  JOIN sz sa ON sa.doc_id = da
       |  JOIN sz sb ON sb.doc_id = db
       |), sel0 AS (
       |  SELECT CAST(NULL AS BIGINT) AS doc_id WHERE false
       |), $rounds
       |SELECT rank, doc_id, bm25_score, max_sim, mmr_score FROM (
       |  ${(1 to 5).map(k =>
            s"SELECT CAST($k AS BIGINT) AS rank, doc_id, " +
              "score AS bm25_score, max_sim, mmr AS mmr_score FROM r" + k)
            .mkString("\n  UNION ALL ")}
       |)
       |ORDER BY rank""".stripMargin
  }

  /** Phrase search over a POSITIONAL inverted index: each phrase word's
    * posting list is filtered at the scan (word = literal pushes down),
    * then adjacency is an equality join on (doc_id, position+offset) —
    * the real phrase-query plan: posting lists stay word-sized, never
    * corpus-sized, and the join keys are co-partitionable on doc_id.
    * posexplode is 0-based vs the oracle's 1-based subscripts; only
    * RELATIVE offsets enter the join, so the bases cancel. */
  private def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("p", "w")))
    def posting(word: String, off: Int) =
      toks.filter($"w" === word)
        .select($"doc_id".as(s"d$off"), ($"p" - off).as(s"a$off"))
    posting("stream", 0)
      .join(posting("table", 1), $"d0" === $"d1" && $"a0" === $"a1")
      .join(posting("hash", 2), $"d0" === $"d2" && $"a0" === $"a2")
      .groupBy($"d0".as("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .orderBy($"doc_id")
  }

  private val phraseSearchSql =
    """WITH toks AS MATERIALIZED (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |    generate_subscripts(string_split(text, ' '), 1) AS p
      |  FROM documents)
      |SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
      |FROM toks a
      |JOIN toks b ON a.doc_id = b.doc_id AND b.p = a.p + 1
      |JOIN toks c ON a.doc_id = c.doc_id AND c.p = a.p + 2
      |WHERE a.w = 'stream' AND b.w = 'table' AND c.w = 'hash'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------- content-defined chunking dedup
  /** Content-defined chunking (CDC) dedup — the backup-system /
    * storage-layer dedup family (gear/Rabin boundaries), complementing
    * the n-gram and suffix families already here: chunk boundaries are
    * decided by CONTENT (a token whose md5 ≡ 0 mod 8 closes a chunk),
    * so an insertion early in a document only perturbs one chunk and
    * every later chunk still matches — the property fixed-width
    * shingling lacks. Chunks are md5-keyed and duplicate chunks counted
    * corpus-wide; per-source rows report the chunk-level dedup ratio
    * (tokens in duplicate chunk occurrences / total tokens).
    *
    * Exactness: the boundary predicate, chunk assembly (position-ordered
    * fold), and all counts are integers; ratios are single divisions.
    * Scale: one posexplode + a per-doc window (doc-bounded), then one
    * shuffle on chunk hash — never doc-pair. */
  private def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        posexplode(split(trim($"text"), "\\s+")).as(Seq("pos", "tok")))
      .withColumn("boundary",
        pmod(conv(substring(md5($"tok".cast("binary")), 1, 8), 16, 10)
          .cast("long"), lit(8L)) === 0L)
    // chunk id = boundaries BEFORE this token (a boundary token closes
    // its chunk, so it belongs to the chunk it terminates)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val chunks = toks
      .withColumn("chunk_seq",
        coalesce(sum(when($"boundary", 1L).otherwise(0L)).over(w), lit(0L)))
      .groupBy($"doc_id", $"source", $"chunk_seq")
      .agg(count(lit(1)).as("n_toks"),
        md5(expr("cast(concat_ws(' ', transform(array_sort(" +
          "collect_list(struct(pos, tok))), p -> p.tok)) as binary)"))
          .as("chunk_hash"))
    val dupes = chunks.groupBy($"chunk_hash")
      .agg(count(lit(1)).as("occ"))
    chunks.join(dupes, Seq("chunk_hash"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"occ" > 1L, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum($"n_toks").cast("long").as("n_toks"),
        sum(when($"occ" > 1L, $"n_toks").otherwise(0L)).cast("long")
          .as("dup_toks"))
      .withColumn("dup_ratio",
        $"dup_toks".cast("double") / $"n_toks".cast("double"))
      .orderBy($"source")
  }

  private val cdcChunksSql =
    """WITH toks AS (
      |  SELECT doc_id, source, pos - 1 AS pos, tok,
      |    (CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 8 = 0)
      |      AS boundary
      |  FROM (SELECT doc_id, source,
      |          unnest(string_split_regex(trim(text), '\s+')) AS tok,
      |          generate_subscripts(string_split_regex(trim(text), '\s+'), 1)
      |            AS pos
      |        FROM documents)
      |), seq AS (
      |  SELECT doc_id, source, pos, tok,
      |    COALESCE(SUM(CASE WHEN boundary THEN 1 ELSE 0 END) OVER (
      |      PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS chunk_seq
      |  FROM toks
      |), chunks AS (
      |  SELECT doc_id, source, chunk_seq,
      |    CAST(COUNT(*) AS BIGINT) AS n_toks,
      |    md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
      |  FROM seq GROUP BY 1, 2, 3
      |), dupes AS (
      |  SELECT chunk_hash, CAST(COUNT(*) AS BIGINT) AS occ
      |  FROM chunks GROUP BY 1
      |)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |  CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_dup_chunks,
      |  CAST(SUM(n_toks) AS BIGINT) AS n_toks,
      |  CAST(SUM(CASE WHEN occ > 1 THEN n_toks ELSE 0 END) AS BIGINT)
      |    AS dup_toks,
      |  CAST(SUM(CASE WHEN occ > 1 THEN n_toks ELSE 0 END) AS DOUBLE)
      |    / CAST(SUM(n_toks) AS DOUBLE) AS dup_ratio
      |FROM chunks JOIN dupes USING (chunk_hash)
      |GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------- partition modularity
  /** Newman modularity of the LANGUAGE partition over the simhash
    * similarity graph (the `dedup_clusters` edge set — are near-dup
    * links concentrated within languages, as a sane near-dup graph must
    * be, or leaking across them?). Per community c:
    *
    *   Q_c = e_c/m − (d_c/2m)²  =  (4m·e_c − d_c²) / (4m²)
    *
    * — all moments (intra edges e_c, degree sum d_c, edge count m) exact
    * BIGINTs, one double division per row; the ALL row sums the same
    * integers first, so Q = Σ Q_c holds bit-exactly. Edge building is
    * the proven bucket join; degrees are one shuffle on node. */
  private def modularity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // shared session-cached near-dup edge set (round 14): the signature
    // pass and the bucket self-join run once per session, not per query
    val edges = simhashLangEdges(spark, dir)
    val m = edges.agg(count(lit(1)).as("m"))
    val deg = edges.select(col("src").as("id"), col("lang_src").as("lang"))
      .unionAll(edges.select(col("dst").as("id"), col("lang_dst").as("lang")))
      .groupBy(col("id"), col("lang")).agg(count(lit(1)).as("deg"))
    val dc = deg.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("d_c"))
    val ec = edges.filter(col("lang_src") === col("lang_dst"))
      .groupBy(col("lang_src").as("lang")).agg(count(lit(1)).as("e_c"))
    val per = dc.join(ec, Seq("lang"), "left")
      .select(col("lang"), col("n_nodes"),
        coalesce(col("e_c"), lit(0L)).as("e_c"), col("d_c").cast("long").as("d_c"))
    val all = per.agg(lit("ALL").as("lang"),
      sum($"n_nodes").cast("long").as("n_nodes"),
      sum($"e_c").cast("long").as("e_c"), sum($"d_c").cast("long").as("d_c"))
    val out = per.unionAll(all).crossJoin(broadcast(m))
      .select($"lang", $"n_nodes", $"e_c", $"d_c",
        ((lit(4L) * $"m" * $"e_c" - $"d_c" * $"d_c").cast("double") /
          (lit(4L) * $"m" * $"m").cast("double")).as("q_contrib"))
      .orderBy($"lang")
    out
  }

  private val modularitySql =
    """WITH t AS (
      |  SELECT doc_id, list_transform(string_split_regex(trim(text), '\s+'),
      |    s -> CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)) AS si
      |  FROM documents
      |), sim AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(32), b ->
      |      CASE WHEN 2 * len(list_filter(si, x -> (x // CAST(power(2, b) AS BIGINT)) % 2 = 1)) > len(si)
      |           THEN CAST(power(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
      |      (acc, x) -> acc + x) AS simhash
      |  FROM t
      |), bkt AS (
      |  SELECT s.doc_id, s.simhash, s.simhash // 16777216 AS bucket, d.lang
      |  FROM sim s JOIN documents d ON s.doc_id = d.doc_id
      |), edges AS MATERIALIZED (
      |  SELECT a.doc_id AS src, c.doc_id AS dst,
      |    a.lang AS lang_src, c.lang AS lang_dst
      |  FROM bkt a JOIN bkt c ON a.bucket = c.bucket AND a.doc_id < c.doc_id
      |  WHERE bit_count(xor(a.simhash, c.simhash)) <= 6
      |), m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
      |deg AS (
      |  SELECT id, lang, CAST(COUNT(*) AS BIGINT) AS deg FROM (
      |    SELECT src AS id, lang_src AS lang FROM edges
      |    UNION ALL SELECT dst, lang_dst FROM edges)
      |  GROUP BY id, lang
      |), dc AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |    CAST(SUM(deg) AS BIGINT) AS d_c
      |  FROM deg GROUP BY lang
      |), ec AS (
      |  SELECT lang_src AS lang, CAST(COUNT(*) AS BIGINT) AS e_c
      |  FROM edges WHERE lang_src = lang_dst GROUP BY 1
      |), per AS (
      |  SELECT dc.lang, dc.n_nodes, COALESCE(ec.e_c, 0) AS e_c, dc.d_c
      |  FROM dc LEFT JOIN ec ON dc.lang = ec.lang
      |), rows_ AS (
      |  SELECT lang, n_nodes, e_c, d_c FROM per
      |  UNION ALL
      |  SELECT 'ALL', CAST(SUM(n_nodes) AS BIGINT), CAST(SUM(e_c) AS BIGINT),
      |    CAST(SUM(d_c) AS BIGINT) FROM per
      |)
      |SELECT lang, n_nodes, CAST(e_c AS BIGINT) AS e_c,
      |  CAST(d_c AS BIGINT) AS d_c,
      |  CAST(4 * m.m * e_c - d_c * d_c AS DOUBLE)
      |    / CAST(4 * m.m * m.m AS DOUBLE) AS q_contrib
      |FROM rows_, m ORDER BY lang""".stripMargin

  // ------------------------------------------------- partition conductance
  /** CONDUCTANCE of each language community over the same simhash
    * near-dup graph as [[modularity]] — the other standard community
    * quality measure (modularity rewards intra-density, conductance
    * penalizes boundary leakage): φ_c = cut_c / min(vol_c, 2m − vol_c),
    * where cut_c counts edges with exactly one endpoint in c and vol_c
    * is c's degree sum. All moments exact BIGINTs from the proven
    * bucketed edge join; one double division per row (guarded for
    * empty/whole-graph communities). Low φ = a well-separated near-dup
    * community; complements the Q_c rows rather than duplicating them. */
  private def conductance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // shared session-cached near-dup edge set (round 14) — identical
    // rows to the private build this replaces, no pins to release
    val edges = simhashLangEdges(spark, dir)
    val m = edges.agg(count(lit(1)).as("m"))
    val deg = edges.select(col("src").as("id"), col("lang_src").as("lang"))
      .unionAll(edges.select(col("dst").as("id"), col("lang_dst").as("lang")))
      .groupBy(col("id"), col("lang")).agg(count(lit(1)).as("deg"))
    val dc = deg.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("d_c"))
    val crossE = edges.filter(col("lang_src") =!= col("lang_dst"))
    val cut = crossE.select(col("lang_src").as("lang"))
      .unionAll(crossE.select(col("lang_dst").as("lang")))
      .groupBy(col("lang")).agg(count(lit(1)).as("cut_c"))
    val out = dc.join(cut, Seq("lang"), "left").crossJoin(broadcast(m))
      .select($"lang", $"n_nodes",
        coalesce($"cut_c", lit(0L)).as("cut_c"),
        $"d_c".cast("long").as("d_c"),
        when(least($"d_c", lit(2L) * $"m" - $"d_c") > 0,
          coalesce($"cut_c", lit(0L)).cast("double") /
            least($"d_c", lit(2L) * $"m" - $"d_c"))
          .otherwise(lit(0.0)).as("conductance"))
      .orderBy($"lang")
    out
  }

  private val conductanceSql =
    """WITH t AS (
      |  SELECT doc_id, list_transform(string_split_regex(trim(text), '\s+'),
      |    s -> CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)) AS si
      |  FROM documents
      |), sim AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(32), b ->
      |      CASE WHEN 2 * len(list_filter(si, x -> (x // CAST(power(2, b) AS BIGINT)) % 2 = 1)) > len(si)
      |           THEN CAST(power(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
      |      (acc, x) -> acc + x) AS simhash
      |  FROM t
      |), bkt AS (
      |  SELECT s.doc_id, s.simhash, s.simhash // 16777216 AS bucket, d.lang
      |  FROM sim s JOIN documents d ON s.doc_id = d.doc_id
      |), edges AS MATERIALIZED (
      |  SELECT a.doc_id AS src, c.doc_id AS dst,
      |    a.lang AS lang_src, c.lang AS lang_dst
      |  FROM bkt a JOIN bkt c ON a.bucket = c.bucket AND a.doc_id < c.doc_id
      |  WHERE bit_count(xor(a.simhash, c.simhash)) <= 6
      |), m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
      |deg AS (
      |  SELECT id, lang, CAST(COUNT(*) AS BIGINT) AS deg FROM (
      |    SELECT src AS id, lang_src AS lang FROM edges
      |    UNION ALL SELECT dst, lang_dst FROM edges)
      |  GROUP BY id, lang
      |), dc AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |    CAST(SUM(deg) AS BIGINT) AS d_c
      |  FROM deg GROUP BY lang
      |), cut AS (
      |  SELECT lang, CAST(SUM(c) AS BIGINT) AS cut_c FROM (
      |    SELECT lang_src AS lang, COUNT(*) AS c FROM edges
      |    WHERE lang_src <> lang_dst GROUP BY 1
      |    UNION ALL
      |    SELECT lang_dst, COUNT(*) FROM edges
      |    WHERE lang_src <> lang_dst GROUP BY 1)
      |  GROUP BY lang
      |)
      |SELECT dc.lang, dc.n_nodes, COALESCE(cut.cut_c, 0) AS cut_c, dc.d_c,
      |  CASE WHEN LEAST(dc.d_c, 2 * m.m - dc.d_c) > 0
      |       THEN CAST(COALESCE(cut.cut_c, 0) AS DOUBLE)
      |            / LEAST(dc.d_c, 2 * m.m - dc.d_c)
      |       ELSE 0.0 END AS conductance
      |FROM dc LEFT JOIN cut ON dc.lang = cut.lang, m
      |ORDER BY dc.lang""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_conductance" -> (conductance _),
    "dedup_cdc_chunks" -> (cdcChunks _),
    "graph_modularity" -> (modularity _),
    "text_phrase_search" -> (phraseSearch _),
    "text_bm25_search" -> (bm25Search _),
    "text_mmr_rerank" -> (mmrRerank _),
    "text_salient_terms" -> (salientTerms _),
    "text_bpe_tokens" -> (bpeTokens _),
    "text_token_stats" -> (tokenStats _),
    "text_quality_score" -> (quality _),
    "text_repetition" -> (repetition _),
    "text_decontaminate" -> (decontaminate _),
    "text_decontaminate_fuzzy" -> (decontaminateFuzzy _),
    "dedup_bbit_minhash" -> (bbitMinhash _),
    "text_winnowing" -> (winnowing _),
    "stream_winnowing" ->
      ((s: SparkSession, d: String) => winnowingStream(s, d)),
    "dedup_winnowing_pairs" -> (winnowingPairs _),
    "stream_winnowing_pairs" -> (winnowingPairsStream _),
    "text_bpe_merges" -> (bpeMerges _),
    "text_bpe_encode" -> (bpeEncode _),
    "text_lm_score" -> (lmScore _),
    "text_ccnet_buckets" -> (ccnetBuckets _),
    "text_rank_keywords" -> (textRank _),
    "dedup_substring" -> (dedupSubstring _),
    "corpus_curation_funnel" -> (curationFunnel _),
    "corpus_funnel_audit" -> (funnelAudit _),
    "corpus_dataset_card" -> (datasetCard _),
    "text_lang_id" -> (langId _),
    "text_langid_confusion" -> (langidConfusion _),
    "text_zipf_octaves" -> (zipfOctaves _),
    "text_rake_keyphrases" -> (rakeKeyphrases _),
    "text_fingerprint" -> (fingerprint _),
    "dedup_exact" -> (dedupExact _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_minhash_lsh" -> (minHashLsh _),
    "dedup_simhash" -> (simHash _),
    "dedup_simhash_pairs" -> (simHashPairs _),
    "dedup_clusters" -> (dedupClusters _),
    "graph_triangles" -> (triangles _),
    "dedup_prefix_join" -> (prefixJoin _),
    "dedup_minhash_eval" -> (minhashEval _),
    "dedup_minhash_scurve" -> (minhashScurve _),
    "dedup_keep_best" -> (dedupKeepBest _),
    "dedup_paragraph" -> (dedupParagraph _),
    "dedup_incremental_bands" -> (dedupIncrementalBands _))

  override def oracles: Map[String, String] = Map(
    "dedup_cdc_chunks" -> cdcChunksSql,
    "graph_modularity" -> modularitySql,
    "graph_conductance" -> conductanceSql,
    "text_phrase_search" -> phraseSearchSql,
    "text_bm25_search" -> bm25SearchSql,
    "text_langid_confusion" -> langidConfusionSql,
    "text_zipf_octaves" -> zipfOctavesSql,
    "text_rake_keyphrases" -> rakeKeyphrasesSql,
    "text_mmr_rerank" -> mmrSql,
    "text_salient_terms" -> salientTermsSql,
    "text_bpe_tokens" -> bpeTokensSql,
    "text_token_stats" -> tokenStatsSql,
    "text_quality_score" -> qualitySql,
    "text_repetition" -> repetitionSql,
    "text_decontaminate" -> decontaminateSql,
    "text_decontaminate_fuzzy" -> decontaminateFuzzySql,
    "dedup_bbit_minhash" -> bbitMinhashSql,
    "text_winnowing" -> winnowingSql,
    "stream_winnowing" -> winnowingSql,
    "dedup_winnowing_pairs" -> winnowingPairsSql,
    "stream_winnowing_pairs" -> winnowingPairsStreamSql,
    "text_bpe_merges" -> bpeMergesSql,
    "text_bpe_encode" -> bpeEncodeSql,
    "text_lm_score" -> lmScoreSql,
    "text_ccnet_buckets" -> ccnetBucketsSql,
    "text_rank_keywords" -> textRankSql,
    "dedup_substring" -> dedupSubstringSql,
    "corpus_curation_funnel" -> curationFunnelSql,
    "corpus_funnel_audit" -> funnelAuditSql,
    "corpus_dataset_card" -> datasetCardSql,
    "text_lang_id" -> langIdSql,
    "text_fingerprint" -> fingerprintSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_ngram_jaccard" -> ngramJaccardSql,
    "dedup_minhash_lsh" -> minHashLshSql,
    "dedup_simhash" -> simHashSql,
    "dedup_simhash_pairs" -> simHashPairsSql,
    "dedup_clusters" -> dedupClustersSql,
    "graph_triangles" -> trianglesSql,
    "dedup_prefix_join" -> prefixJoinSql,
    "dedup_minhash_eval" -> minhashEvalSql,
    "dedup_minhash_scurve" -> minhashScurveSql,
    "dedup_keep_best" -> dedupKeepBestSql,
    "dedup_paragraph" -> dedupParagraphSql,
    "dedup_incremental_bands" -> dedupIncrementalBandsSql)
}
