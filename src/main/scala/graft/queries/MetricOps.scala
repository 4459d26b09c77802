package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import Exact._

/** Time-series / corpus-growth / range-join / retrieval-eval operators —
  * the measurement layer around the feature pipeline (ref inference/ and
  * the monitoring queries the reference's dashboards run):
  *
  *   - EXACT autocorrelation (lags 1..5) of the per-minute event-count
  *     series on a gap-filled minute grid — the moments are kept as exact
  *     DECIMAL(38,0) integer sums (the n·x−S "multiply-through" form
  *     removes the rational mean entirely), so each r_k is ONE double
  *     division of two exactly-computed integers;
  *   - Heaps-law vocabulary growth: distinct-token count of the corpus
  *     prefix at 10 doc-id checkpoints, computed from each token's FIRST
  *     document (one shuffle on token) — never a per-checkpoint rescan;
  *   - banded numeric range join (|Δprice| ≤ $1 within an order month)
  *     via the bucket-explode trick: each left row explodes to its three
  *     neighbor buckets and the join is a plain shuffle EQUI-join on
  *     (month, bucket) — the band predicate only filters candidate pairs,
  *     so there is no theta-join / IEJoin and no cross product;
  *   - retrieval-quality metrics (precision@10 hits, first relevant rank,
  *     LCM-scaled reciprocal rank) for a 5-query BM25 eval set —
  *     relevance = conjunctive term match, MRR kept exact by scaling
  *     1/rank by LCM(1..20) = 232792560 into integers.
  *
  * 100 TB notes: the ACF series length is bounded by calendar minutes
  * (~526k/year), so the single ordered lead() window is a bounded-size
  * final stage over a pre-aggregated table (the per-minute groupBy is the
  * only data-sized shuffle); Heaps checkpoints fan distinct tokens out
  * ×10 against a broadcast 10-row checkpoint table; the band join's
  * bucket width equals the band so each row meets only its 3 neighbor
  * buckets (same shape DuckDB/Trino range-join optimizers produce); the
  * BM25 eval reuses the inverted-index guard (`arrays_overlap` pre-filter
  * before any explode) and ranks per query partition — top-20 of a
  * term-bounded candidate set, never a global sort.
  */
object MetricOps extends QueryModule {

  // ------------------------------------------------------- autocorrelation
  private val acfLags = 1 to 5

  /** ACF of per-minute event counts. r_k = Σ(n·x_t−S)(n·x_{t+k}−S) /
    * Σ(n·x_t−S)² over the gap-filled minute grid — all-integer moments
    * (DECIMAL(38,0): the cross products exceed BIGINT at scale), one
    * double division per lag. */
  private def acf(spark: SparkSession, dir: String): DataFrame = {
    val perMin = Tables.events(spark, dir)
      .withColumn("ems", epochMs(col("ts")))
      .select(expr("ems div 60000").as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("c"))
    acfTail(perMin)
  }

  /** The ACF finale over a per-minute count table `(m, c)` — shared by
    * the batch query and the streaming monitor (whose complete-mode
    * aggregation state IS the per-minute table, so both runtimes share
    * this tail and the oracle). */
  private[graft] def acfTail(perMin: DataFrame): DataFrame = {
    val spark = perMin.sparkSession
    import spark.implicits._
    val bounds = perMin.agg(min($"m").as("mn"), max($"m").as("mx"))
    val grid = bounds.select(explode(sequence($"mn", $"mx")).as("m"))
    val x = grid.join(perMin, Seq("m"), "left")
      .select($"m", coalesce($"c", lit(0L)).as("x"))
    val tot = x.agg(count(lit(1)).as("n"), sum($"x").as("s"))
    // bounded series (calendar minutes), pre-aggregated: the ordered
    // window over it is a final small stage, not a data-sized sort
    val w = Window.orderBy($"m")
    val leads = x.select(
      Seq($"m", $"x") ++ acfLags.map(k => lead($"x", k).over(w).as(s"x$k")): _*)
    def dev(c: Column) = (($"n" * c - $"s")).cast(DecimalType(38, 0))
    val j = leads.crossJoin(broadcast(tot))
    val aggCols =
      sum(dev($"x") * dev($"x")).as("den") +:
        acfLags.map(k => sum(when(col(s"x$k").isNotNull,
          dev($"x") * dev(col(s"x$k")))).as(s"num$k"))
    val a = j.agg(aggCols.head, aggCols.tail: _*).crossJoin(broadcast(tot))
    a.select(explode(array(acfLags.map(k => struct(
        lit(k.toLong).as("lag_k"),
        $"n".cast("long").as("n"),
        (col(s"num$k").cast("double") / $"den".cast("double")).as("acf"))): _*))
        .as("r"))
      .select($"r.lag_k", $"r.n", $"r.acf")
      .orderBy($"lag_k")
  }

  private[graft] val acfSql = {
    val leadCols = acfLags.map(k => s"lead(x, $k) OVER w AS x$k").mkString(", ")
    val numCols = acfLags.map(k =>
      s"""SUM(CASE WHEN x$k IS NOT NULL THEN
         |  CAST(n*x - s AS DECIMAL(38,0)) * CAST(n*x$k - s AS DECIMAL(38,0))
         |  END) AS num$k""".stripMargin).mkString(",\n  ")
    val arms = acfLags.map(k =>
      s"""SELECT CAST($k AS BIGINT) AS lag_k, CAST(n AS BIGINT) AS n,
         |  CAST(num$k AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM a, t"""
        .stripMargin).mkString("\nUNION ALL\n")
    s"""WITH pm AS (
       |  SELECT epoch_ms(ts) // 60000 AS m, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1
       |), b AS (SELECT MIN(m) AS mn, MAX(m) AS mx FROM pm),
       |grid AS (SELECT unnest(generate_series(mn, mx)) AS m FROM b),
       |x AS (
       |  SELECT grid.m, COALESCE(pm.c, 0) AS x
       |  FROM grid LEFT JOIN pm ON grid.m = pm.m
       |), t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |         CAST(SUM(x) AS BIGINT) AS s FROM x),
       |l AS (SELECT m, x, $leadCols FROM x WINDOW w AS (ORDER BY m)),
       |a AS (SELECT
       |  SUM(CAST(n*x - s AS DECIMAL(38,0))
       |    * CAST(n*x - s AS DECIMAL(38,0))) AS den,
       |  $numCols
       |  FROM l, t)
       |$arms
       |ORDER BY lag_k""".stripMargin
  }

  // --------------------------------------------------- Heaps vocab growth
  /** Heaps-law curve: |vocabulary| of the corpus prefix doc_id ≤ ckpt_i at
    * 10 checkpoints. One shuffle on token (min first_doc per token); the
    * cumulative counts come from fanning tokens out against the broadcast
    * 10-row checkpoint table — never re-scanning the corpus per
    * checkpoint. */
  private def heapsGrowth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val firsts = docs
      .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("tok"))
      .groupBy($"tok").agg(min($"doc_id").as("first_doc"))
    val c = docs.agg(max($"doc_id").as("mx"))
      .select(explode(sequence(lit(1), lit(10))).as("i0"), $"mx")
      .select($"i0".cast("long").as("i"),
        expr("(mx * i0) div 10").cast("long").as("ckpt"))
    val vocab = firsts.join(broadcast(c), $"first_doc" <= $"ckpt")
      .groupBy($"i", $"ckpt").agg(count(lit(1)).as("v"))
    val nd = docs.join(broadcast(c), $"doc_id" <= $"ckpt")
      .groupBy($"i").agg(count(lit(1)).as("d"))
    c.join(vocab, Seq("i", "ckpt"), "left").join(nd, Seq("i"), "left")
      .select($"i", $"ckpt", coalesce($"d", lit(0L)).as("n_docs"),
        coalesce($"v", lit(0L)).as("vocab"))
      .orderBy($"i")
  }

  private val heapsGrowthSql =
    """WITH tk AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents
      |), f AS (SELECT tok, MIN(doc_id) AS first_doc FROM tk GROUP BY tok),
      |c AS (
      |  SELECT CAST(i AS BIGINT) AS i, CAST((mx * i) // 10 AS BIGINT) AS ckpt
      |  FROM (SELECT unnest(generate_series(1, 10)) AS i),
      |       (SELECT MAX(doc_id) AS mx FROM documents)
      |), v AS (
      |  SELECT c.i, CAST(COUNT(f.tok) AS BIGINT) AS vocab
      |  FROM c LEFT JOIN f ON f.first_doc <= c.ckpt GROUP BY c.i
      |), dn AS (
      |  SELECT c.i, CAST(COUNT(d.doc_id) AS BIGINT) AS n_docs
      |  FROM c LEFT JOIN documents d ON d.doc_id <= c.ckpt GROUP BY c.i
      |)
      |SELECT c.i, c.ckpt, dn.n_docs, v.vocab
      |FROM c JOIN v USING (i) JOIN dn USING (i)
      |ORDER BY c.i""".stripMargin

  // ------------------------------------------------------- banded range join
  /** Order pairs within the same month whose totals differ by ≤ $1.00,
    * as a bucket-explode EQUI-join: bucket width = band width, left rows
    * explode to {b−1, b, b+1}, right keeps b — every qualifying pair
    * meets in exactly one bucket (|Δcents| ≤ 100 ⇒ |Δb| ≤ 1, and the
    * right bucket is single-valued), so no dedup pass is needed. */
  private def bandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select(
      $"o_orderkey".as("okey"),
      floor($"o_totalprice" * 100.0 + 0.5).cast("long").as("cents"),
      (year($"o_orderdate") * 100 + month($"o_orderdate")).cast("long").as("ym"))
    val b = o.withColumn("b", expr("cents div 100"))
    val l = b.select($"okey".as("okey1"), $"cents".as("c1"), $"ym",
      explode(array($"b" - 1, $"b", $"b" + 1)).as("jb"))
    val r = b.select($"okey".as("okey2"), $"cents".as("c2"),
      $"ym".as("ym2"), $"b".as("jb"))
    l.join(r, l("ym") === r("ym2") && l("jb") === r("jb") &&
        l("okey1") < r("okey2") && abs(l("c1") - r("c2")) <= 100)
      .groupBy($"ym").agg(
        count(lit(1)).as("n_pairs"),
        sum(abs($"c1" - $"c2")).cast("long").as("cents_gap_sum"))
      .orderBy($"ym")
  }

  private val bandJoinSql =
    """WITH o AS (
      |  SELECT o_orderkey AS okey,
      |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
      |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym
      |  FROM orders
      |)
      |SELECT a.ym, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(ABS(a.cents - b.cents)) AS BIGINT) AS cents_gap_sum
      |FROM o a JOIN o b ON a.ym = b.ym AND a.okey < b.okey
      |  AND ABS(a.cents - b.cents) <= 100
      |GROUP BY a.ym ORDER BY a.ym""".stripMargin

  // ------------------------------------------------- retrieval rank metrics
  private val rankK1 = 1.2
  private val rankB = 0.75
  /** The eval set: 5 two-term queries over the corpus vocabulary. */
  private val rankQueries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "stream"), 2L -> Seq("join", "query"),
    3L -> Seq("vector", "filter"), 4L -> Seq("spark", "filter"),
    5L -> Seq("stream", "query"))
  private val rankTerms = rankQueries.flatMap(_._2).distinct
  /** LCM(1..20): scales 1/rank into an exact integer. */
  private val rrLcm = 232792560L

  /** Retrieval eval harness: BM25 top-20 per eval query (same scorer and
    * sequential-fold discipline as `text_bm25_search`), relevance =
    * conjunctive term match, metrics per query as exact integers —
    * precision@10 hit count, first relevant rank, LCM-scaled reciprocal
    * rank. */
  private def rankMetrics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir)
      .withColumn("toks", split(trim($"text"), "\\s+"))
      .withColumn("dl", size($"toks").cast("long"))
    val stats = d.agg(count(lit(1)).as("n_docs"), sum($"dl").as("tot"))
    val tf = d
      .filter(arrays_overlap($"toks", array(rankTerms.map(lit): _*)))
      .select($"doc_id", $"dl", explode($"toks").as("term"))
      .filter($"term".isin(rankTerms: _*))
      .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", $"tot".cast("double") / $"n_docs".cast("double"))
      .withColumn("idf",
        ($"n_docs".cast("double") - $"df".cast("double") + lit(0.5)) /
          ($"df".cast("double") + lit(0.5)))
      .withColumn("s",
        $"idf" * $"tf".cast("double") * lit(rankK1 + 1.0) /
          ($"tf".cast("double") + lit(rankK1) *
            (lit(1.0 - rankB) + lit(rankB) * $"dl".cast("double") / $"avgdl")))
    val qt = rankQueries
      .flatMap { case (qid, ts) => ts.map(t => (qid, t, ts.size.toLong)) }
      .toDF("query_id", "term", "qsize")
    val perDoc = scored.join(broadcast(qt), Seq("term"))
      .groupBy($"query_id", $"qsize", $"doc_id")
      .agg(count(lit(1)).as("n_match"),
        expr("""aggregate(array_sort(collect_list(struct(term, s))),
          |  cast(0.0 as double), (acc, x) -> acc + x.s)""".stripMargin)
          .as("score0"))
      .withColumn("score", round($"score0", 6))
    val ranked = perDoc
      .withColumn("rnk", row_number().over(Window.partitionBy($"query_id")
        .orderBy($"score".desc, $"doc_id")).cast("long"))
      .filter($"rnk" <= 20)
      .withColumn("rel", $"n_match" === $"qsize")
    ranked.groupBy($"query_id").agg(
        count(lit(1)).as("n_cand"),
        sum(when($"rel" && $"rnk" <= 10, 1L).otherwise(0L)).as("prec10_hits"),
        coalesce(min(when($"rel", $"rnk")), lit(0L)).as("first_rel_rank"))
      .withColumn("rr_x232792560",
        when($"first_rel_rank" > 0, expr(s"$rrLcm div first_rel_rank"))
          .otherwise(lit(0L)))
      .select($"query_id", $"n_cand", $"prec10_hits", $"first_rel_rank",
        $"rr_x232792560")
      .orderBy($"query_id")
  }

  private val rankMetricsSql = {
    val terms = rankTerms.map(t => s"'$t'").mkString(", ")
    val qvals = rankQueries
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""WITH d AS (
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
       |  WHERE term IN ($terms) GROUP BY doc_id, dl, term
       |), df AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
       |), bscored AS (
       |  SELECT tf.doc_id, tf.term,
       |    ((CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
       |      / (CAST(df.df AS DOUBLE) + 0.5))
       |    * CAST(tf.tf AS DOUBLE) * ${rankK1 + 1.0}
       |    / (CAST(tf.tf AS DOUBLE) + $rankK1 *
       |        (${1.0 - rankB} + $rankB * CAST(tf.dl AS DOUBLE)
       |          / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS s
       |  FROM tf JOIN df USING (term), st
       |), q(query_id, term) AS (VALUES $qvals),
       |qs AS (
       |  SELECT CAST(query_id AS BIGINT) AS query_id,
       |    CAST(COUNT(*) AS BIGINT) AS qsize FROM q GROUP BY 1
       |), ds AS (
       |  SELECT CAST(q.query_id AS BIGINT) AS query_id, b.doc_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_match,
       |    ROUND(list_reduce(list_prepend(0.0, list(s ORDER BY b.term)),
       |      (acc, x) -> acc + x), 6) AS score
       |  FROM bscored b JOIN q ON b.term = q.term GROUP BY 1, 2
       |), r AS (
       |  SELECT query_id, doc_id, n_match, score,
       |    CAST(row_number() OVER (
       |      PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT)
       |      AS rnk
       |  FROM ds
       |), t AS (
       |  SELECT r.query_id, rnk, (n_match = qsize) AS rel
       |  FROM r JOIN qs USING (query_id) WHERE rnk <= 20
       |)
       |SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_cand,
       |  CAST(SUM(CASE WHEN rel AND rnk <= 10 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS prec10_hits,
       |  CAST(COALESCE(MIN(CASE WHEN rel THEN rnk END), 0) AS BIGINT)
       |    AS first_rel_rank,
       |  CAST(CASE WHEN MIN(CASE WHEN rel THEN rnk END) IS NULL THEN 0
       |    ELSE $rrLcm // MIN(CASE WHEN rel THEN rnk END) END AS BIGINT)
       |    AS rr_x232792560
       |FROM t GROUP BY query_id ORDER BY query_id""".stripMargin
  }

  // -------------------------------------------------- RRF hybrid retrieval
  /** The hybrid query's lexical arm: the canonical 6-term corpus query
    * (same terms as `text_bm25_search`). */
  private val rrfTerms = Seq("spark", "stream", "join", "query",
    "vector", "filter")
  /** Sequential-fold cosine (same discipline as Embeddings.cosOf — the
    * raw doubles agree bit-for-bit cross-engine). */
  private val rrfCos =
    """aggregate(zip_with(qv, embedding, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, x) -> acc + x)
      | / (sqrt(aggregate(transform(qv, x -> cast(x as double) * cast(x as double)), 0D, (acc, x) -> acc + x))
      |    * sqrt(aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), 0D, (acc, x) -> acc + x)))"""
      .stripMargin.replaceAll("\n", "")

  /** Reciprocal-rank-fusion hybrid search (Cormack et al. 2009, the
    * standard BM25 ⊕ dense-vector fusion): the BM25 top-20 for the
    * canonical term query and the cosine top-20 around the vec_id-0
    * embedding (doc_id ≡ vec_id in the driver corpus) fused by
    * rrf = Σ 1/(60 + rank). Each arm contributes ONE double division and
    * the fusion is one fixed-order addition (lexical first), so no fold
    * is needed for cross-engine parity. Top-10 by (rrf, doc_id).
    *
    * Scale shape: both arms are the proven bounded shapes (inverted-index
    * guard + term-bounded candidates; broadcast query vector + per-query
    * top-k) and the fusion joins two ≤20-row lists. */
  private def rrfHybrid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // lexical arm: BM25 per-doc scores for the canonical terms, top-20
    val d = Tables.documents(spark, dir)
      .withColumn("toks", split(trim($"text"), "\\s+"))
      .withColumn("dl", size($"toks").cast("long"))
    val stats = d.agg(count(lit(1)).as("n_docs"), sum($"dl").as("tot"))
    val tf = d
      .filter(arrays_overlap($"toks", array(rrfTerms.map(lit): _*)))
      .select($"doc_id", $"dl", explode($"toks").as("term"))
      .filter($"term".isin(rrfTerms: _*))
      .groupBy($"doc_id", $"dl", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val lexScored = tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", $"tot".cast("double") / $"n_docs".cast("double"))
      .withColumn("idf",
        ($"n_docs".cast("double") - $"df".cast("double") + lit(0.5)) /
          ($"df".cast("double") + lit(0.5)))
      .withColumn("s",
        $"idf" * $"tf".cast("double") * lit(rankK1 + 1.0) /
          ($"tf".cast("double") + lit(rankK1) *
            (lit(1.0 - rankB) + lit(rankB) * $"dl".cast("double") / $"avgdl")))
      .groupBy($"doc_id")
      .agg(expr("""aggregate(array_sort(collect_list(struct(term, s))),
        |  cast(0.0 as double), (acc, x) -> acc + x.s)""".stripMargin)
        .as("score0"))
      .withColumn("score", round($"score0", 6))
    val lex = lexScored
      .withColumn("rnk", row_number().over(
        Window.orderBy($"score".desc, $"doc_id")).cast("long"))
      .filter($"rnk" <= 20)
      .select($"doc_id", $"rnk".as("rank_lex"))
    // vector arm: cosine top-20 around the vec_id-0 embedding
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val vec = emb.crossJoin(broadcast(q)).filter($"vec_id" =!= 0)
      .withColumn("cos", round(expr(rrfCos), 6))
      .withColumn("rnk", row_number().over(
        Window.orderBy($"cos".desc, $"vec_id")).cast("long"))
      .filter($"rnk" <= 20)
      .select($"vec_id".as("doc_id"), $"rnk".as("rank_vec"))
    // fusion: one fixed-order addition, lexical contribution first
    lex.join(vec, Seq("doc_id"), "full_outer")
      .select($"doc_id", $"rank_lex", $"rank_vec",
        round(
          coalesce(lit(1.0) / (lit(60.0) + $"rank_lex".cast("double")),
            lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + $"rank_vec".cast("double")),
            lit(0.0)), 6).as("rrf"))
      .withColumn("rank", row_number().over(
        Window.orderBy($"rrf".desc, $"doc_id")).cast("long"))
      .filter($"rank" <= 10)
      .select($"rank", $"doc_id", $"rrf",
        $"rank_lex".isNotNull.as("in_lex"), $"rank_vec".isNotNull.as("in_vec"),
        coalesce($"rank_lex", lit(0L)).as("rank_lex"),
        coalesce($"rank_vec", lit(0L)).as("rank_vec"))
      .orderBy($"rank")
  }

  private val rrfHybridSql = {
    val terms = rrfTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH d AS (
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
       |  WHERE term IN ($terms) GROUP BY doc_id, dl, term
       |), df AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
       |), bscored AS (
       |  SELECT tf.doc_id, tf.term,
       |    ((CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
       |      / (CAST(df.df AS DOUBLE) + 0.5))
       |    * CAST(tf.tf AS DOUBLE) * ${rankK1 + 1.0}
       |    / (CAST(tf.tf AS DOUBLE) + $rankK1 *
       |        (${1.0 - rankB} + $rankB * CAST(tf.dl AS DOUBLE)
       |          / (CAST(tot AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS s
       |  FROM tf JOIN df USING (term), st
       |), lexs AS (
       |  SELECT doc_id,
       |    ROUND(list_reduce(list_prepend(0.0, list(s ORDER BY term)),
       |      (acc, x) -> acc + x), 6) AS score
       |  FROM bscored GROUP BY doc_id
       |), lex AS (
       |  SELECT doc_id, rnk AS rank_lex FROM (
       |    SELECT doc_id, CAST(row_number() OVER (
       |      ORDER BY score DESC, doc_id) AS BIGINT) AS rnk FROM lexs)
       |  WHERE rnk <= 20
       |), q AS (
       |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
       |), vscored AS (
       |  SELECT e.vec_id AS doc_id,
       |    ROUND(
       |      list_reduce(list_prepend(0.0, list_transform(range(1, 65),
       |        i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (acc, x) -> acc + x)
       |      / (SQRT(list_reduce(list_prepend(0.0, list_transform(range(1, 65),
       |           i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))), (acc, x) -> acc + x))
       |         * SQRT(list_reduce(list_prepend(0.0, list_transform(range(1, 65),
       |           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (acc, x) -> acc + x)))
       |    , 6) AS cos
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
       |), vec AS (
       |  SELECT doc_id, rnk AS rank_vec FROM (
       |    SELECT doc_id, CAST(row_number() OVER (
       |      ORDER BY cos DESC, doc_id) AS BIGINT) AS rnk FROM vscored)
       |  WHERE rnk <= 20
       |), fused AS (
       |  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
       |    rank_lex, rank_vec,
       |    ROUND(
       |      COALESCE(CAST(1.0 AS DOUBLE)
       |        / (CAST(60.0 AS DOUBLE) + CAST(rank_lex AS DOUBLE)), 0.0)
       |      + COALESCE(CAST(1.0 AS DOUBLE)
       |        / (CAST(60.0 AS DOUBLE) + CAST(rank_vec AS DOUBLE)), 0.0), 6)
       |      AS rrf
       |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
       |)
       |SELECT rank, doc_id, rrf, in_lex, in_vec, rank_lex, rank_vec FROM (
       |  SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
       |      AS rank,
       |    doc_id, rrf,
       |    rank_lex IS NOT NULL AS in_lex, rank_vec IS NOT NULL AS in_vec,
       |    CAST(COALESCE(rank_lex, 0) AS BIGINT) AS rank_lex,
       |    CAST(COALESCE(rank_vec, 0) AS BIGINT) AS rank_vec
       |  FROM fused)
       |WHERE rank <= 10 ORDER BY rank""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_acf" -> (acf _),
    "text_heaps_growth" -> (heapsGrowth _),
    "rel_band_join" -> (bandJoin _),
    "ml_rank_metrics" -> (rankMetrics _),
    "emb_rrf_hybrid" -> (rrfHybrid _))

  override def oracles: Map[String, String] = Map(
    "evt_acf" -> acfSql,
    "text_heaps_growth" -> heapsGrowthSql,
    "rel_band_join" -> bandJoinSql,
    "ml_rank_metrics" -> rankMetricsSql,
    "emb_rrf_hybrid" -> rrfHybridSql)
}
