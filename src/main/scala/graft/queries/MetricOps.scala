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
  *     1/rank by LCM(1..20) = 232792560 into integers;
  *   - reciprocal-rank-fusion hybrid retrieval (BM25 ⊕ dense cosine);
  *   - local clustering coefficient over the LSH-band similarity graph
  *     (shares `graph_triangles`' edge definition);
  *   - temperature-reweighted source-mixture sampling weights (T = 2);
  *   - per-type traffic burstiness (Fano factor, batch + streaming);
  *   - tokenizer fertility per language (subwords per word).
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
  /** Order pairs within the same month whose totals differ by ≤ $100,
    * as a bucket-explode EQUI-join: bucket width = band width, left rows
    * explode to {b−1, b, b+1}, right keeps b — every qualifying pair
    * meets in exactly one bucket (|Δcents| ≤ 10000 ⇒ |Δb| ≤ 1, and the
    * right bucket is single-valued), so no dedup pass is needed. ($100,
    * not $1: the r7 band had zero qualifying pairs at sf0.001, caught by
    * the EntrySpec rows>0 smoke — same lesson as the k=25 k-anonymity
    * gate.) */
  private def bandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select(
      $"o_orderkey".as("okey"),
      floor($"o_totalprice" * 100.0 + 0.5).cast("long").as("cents"),
      (year($"o_orderdate") * 100 + month($"o_orderdate")).cast("long").as("ym"))
    val b = o.withColumn("b", expr("cents div 10000"))
    val l = b.select($"okey".as("okey1"), $"cents".as("c1"), $"ym",
      explode(array($"b" - 1, $"b", $"b" + 1)).as("jb"))
    val r = b.select($"okey".as("okey2"), $"cents".as("c2"),
      $"ym".as("ym2"), $"b".as("jb"))
    l.join(r, l("ym") === r("ym2") && l("jb") === r("jb") &&
        l("okey1") < r("okey2") && abs(l("c1") - r("c2")) <= 10000)
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
      |  AND ABS(a.cents - b.cents) <= 10000
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

  // -------------------------------------------------- clustering coefficient
  /** Local clustering coefficient over the LSH-band similarity graph
    * (same edge set as `graph_triangles` — the two queries can never
    * diverge on what "the graph" is): cc = 2·triangles / (deg·(deg−1)),
    * kept as two exact integers plus the one double division. Triangle
    * enumeration is the same a<b<c edge-join; degrees are one shuffle on
    * node. */
  private def clusteringCoeff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = TextAnalysis.lshEdges(spark, dir)
    val deg = e.select($"a".as("doc_id"))
      .unionAll(e.select($"b".as("doc_id")))
      .groupBy($"doc_id").agg(count(lit(1)).as("deg"))
    val tri = e.select($"a", $"b")
      .join(e.select($"a".as("b"), $"b".as("c")), Seq("b"))
      .join(e.select($"a", $"b".as("c"), lit(1).as("closed")), Seq("a", "c"))
      .select(explode(array($"a", $"b", $"c")).as("doc_id"))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_triangles"))
    deg.join(tri, Seq("doc_id"), "left")
      .select($"doc_id", $"deg",
        coalesce($"n_triangles", lit(0L)).as("n_triangles"))
      .withColumn("cc",
        when($"deg" > 1, (lit(2L) * $"n_triangles").cast("double") /
          ($"deg" * ($"deg" - 1)).cast("double")).otherwise(lit(0.0)))
      .orderBy($"doc_id")
  }

  /** The LSH similarity graph's edge CTE chain — shared verbatim by the
    * clustering-coefficient and assortativity oracles (and matching
    * `graph_triangles`' edges), so "the graph" is one definition. */
  private val lshEdgeCtes =
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
      |)""".stripMargin

  private val clusteringCoeffSql =
    s"""$lshEdgeCtes, deg AS (""".stripMargin +
    """
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
      |    SELECT a AS doc_id FROM e UNION ALL SELECT b FROM e)
      |  GROUP BY doc_id
      |), tri AS (
      |  SELECT e1.a, e1.b, e2.b AS c
      |  FROM e e1 JOIN e e2 ON e1.b = e2.a
      |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
      |), ntri AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
      |    SELECT a AS doc_id FROM tri
      |    UNION ALL SELECT b FROM tri
      |    UNION ALL SELECT c FROM tri)
      |  GROUP BY doc_id
      |)
      |SELECT deg.doc_id, deg.deg,
      |  CAST(COALESCE(ntri.n_triangles, 0) AS BIGINT) AS n_triangles,
      |  CASE WHEN deg.deg > 1 THEN
      |    CAST(2 * COALESCE(ntri.n_triangles, 0) AS DOUBLE)
      |      / CAST(deg.deg * (deg.deg - 1) AS DOUBLE)
      |  ELSE 0.0 END AS cc
      |FROM deg LEFT JOIN ntri ON deg.doc_id = ntri.doc_id
      |ORDER BY deg.doc_id""".stripMargin

  // ------------------------------------------------- degree assortativity
  /** Degree assortativity of the LSH similarity graph (Newman's r — do
    * high-degree docs cluster with each other, i.e. is the near-dup
    * graph hub-and-spoke or clique-y?). Over the SYMMETRIZED edge list
    * the x- and y-moments coincide, so the usual Pearson collapses to
    *
    *   r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²),  M = 2|E|
    *
    * — no square roots at all: two exact DECIMAL(38,0) integers and ONE
    * double division. One shuffle builds degrees, two broadcast-sized
    * joins attach them to edge endpoints; edge count is LSH-band-bounded
    * like every other query on this graph. */
  private def assortativity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = TextAnalysis.lshEdges(spark, dir)
    val deg = e.select($"a".as("n"))
      .unionAll(e.select($"b".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("deg"))
    val j = e
      .join(deg.select($"n".as("a"), $"deg".as("da")), Seq("a"))
      .join(deg.select($"n".as("b"), $"deg".as("db")), Seq("b"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val mom = j.agg(
      count(lit(1)).as("n_edges"),
      (count(lit(1)) * 2L).as("m"),
      sum($"da" + $"db").as("sx"),
      sum(($"da" * $"da" + $"db" * $"db").cast(DecimalType(38, 0))).as("sxx"),
      sum((lit(2L) * $"da" * $"db").cast(DecimalType(38, 0))).as("sxy"))
    mom.crossJoin(broadcast(nNodes))
      .withColumn("num",
        $"m".cast(DecimalType(38, 0)) * $"sxy" -
          $"sx".cast(DecimalType(38, 0)) * $"sx".cast(DecimalType(38, 0)))
      .withColumn("den",
        $"m".cast(DecimalType(38, 0)) * $"sxx" -
          $"sx".cast(DecimalType(38, 0)) * $"sx".cast(DecimalType(38, 0)))
      .select($"n_nodes", $"n_edges", $"sx".cast("long").as("deg_sum"),
        when($"den" =!= 0, $"num".cast("double") / $"den".cast("double"))
          .otherwise(lit(0.0)).as("assortativity"))
  }

  private val assortativitySql =
    s"""$lshEdgeCtes, deg AS (""" +
    """
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
      |    SELECT a AS doc_id FROM e UNION ALL SELECT b FROM e)
      |  GROUP BY doc_id
      |), j AS (
      |  SELECT da.deg AS da, db.deg AS db
      |  FROM e JOIN deg da ON e.a = da.doc_id JOIN deg db ON e.b = db.doc_id
      |), mom AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
      |    CAST(COUNT(*) * 2 AS BIGINT) AS m,
      |    CAST(SUM(da + db) AS BIGINT) AS sx,
      |    SUM(CAST(da * da + db * db AS DECIMAL(38,0))) AS sxx,
      |    SUM(CAST(2 * da * db AS DECIMAL(38,0))) AS sxy
      |  FROM j
      |), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg)
      |SELECT n_nodes, n_edges, sx AS deg_sum,
      |  CASE WHEN CAST(m AS DECIMAL(38,0)) * sxx
      |      - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) <> 0
      |    THEN CAST(CAST(m AS DECIMAL(38,0)) * sxy
      |        - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))
      |        AS DOUBLE)
      |      / CAST(CAST(m AS DECIMAL(38,0)) * sxx
      |        - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))
      |        AS DOUBLE)
      |    ELSE 0.0 END AS assortativity
      |FROM mom, nn""".stripMargin

  // ------------------------------------------------- temperature mixture
  /** Temperature-reweighted source-mixture weights (the multilingual /
    * multi-source sampling recipe, T = 2 ⇒ w ∝ √tokens): per-source doc
    * and token counts are exact BIGINTs, √ is IEEE-exact, and the
    * normalizer Σ√tokens folds SEQUENTIALLY over source-sorted weights
    * (the small-double-reduction rule) so the share division is the one
    * shared double expression. */
  private def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val per = Tables.documents(spark, dir)
      .withColumn("toks", split(trim($"text"), "\\s+"))
      .groupBy($"source").agg(
        count(lit(1)).as("n_docs"),
        sum(size($"toks").cast("long")).as("n_toks"))
      .withColumn("w", sqrt($"n_toks".cast("double")))
    val tot = per
      .agg(expr("""aggregate(array_sort(collect_list(struct(source, w))),
        |  cast(0.0 as double), (acc, x) -> acc + x.w)""".stripMargin)
        .as("wsum"))
    per.crossJoin(broadcast(tot))
      .select($"source", $"n_docs", $"n_toks", $"w".as("weight"),
        ($"w" / $"wsum").as("share"))
      .orderBy($"source")
  }

  private val temperatureMixSql =
    """WITH per AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
      |      AS n_toks
      |  FROM documents GROUP BY source
      |), w AS (
      |  SELECT source, n_docs, n_toks, SQRT(CAST(n_toks AS DOUBLE)) AS w
      |  FROM per
      |), tot AS (
      |  SELECT list_reduce(list_prepend(0.0, list(w ORDER BY source)),
      |    (acc, x) -> acc + x) AS wsum FROM w
      |)
      |SELECT source, n_docs, n_toks, w AS weight, w / wsum AS share
      |FROM w, tot ORDER BY source""".stripMargin

  // ----------------------------------------------------------- burstiness
  /** Per-type traffic burstiness as the Fano factor of the per-minute
    * count series over the GLOBAL minute grid (absent minutes contribute
    * 0 to every moment, so no grid materialization is needed):
    * F = var/mean = (n·Q − S²)/(n·S) with n = grid minutes, S = Σc,
    * Q = Σc² — exact integer moments, one double division. F ≈ 1 is
    * Poisson; F ≫ 1 is bursty. */
  private def burstiness(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("ems", epochMs(col("ts")))
      .withColumn("m", expr("ems div 60000"))
    burstinessTail(
      ev.groupBy(col("event_type"), col("m")).agg(count(lit(1)).as("c")))
  }

  /** The Fano finale over a per-(type, minute) count table — shared by
    * the batch query and the streaming monitor (whose complete-mode
    * aggregation state IS that table; the global grid bound is the same
    * because every event minute has at least one type row). */
  private[graft] def burstinessTail(perTypeMin: DataFrame): DataFrame = {
    val spark = perTypeMin.sparkSession
    import spark.implicits._
    val grid = perTypeMin.agg((max($"m") - min($"m") + 1L).as("n"))
    val per = perTypeMin
      .groupBy($"event_type").agg(
        sum($"c").as("s"),
        sum(($"c" * $"c").cast(DecimalType(38, 0))).as("q"))
    per.crossJoin(broadcast(grid))
      .select($"event_type", $"n", $"s".cast("long").as("s"),
        (($"n".cast(DecimalType(38, 0)) * $"q" -
          ($"s" * $"s").cast(DecimalType(38, 0))).cast("double") /
          ($"n" * $"s").cast("double")).as("fano"))
      .orderBy($"event_type")
  }

  private[graft] val burstinessSql =
    """WITH ev AS (
      |  SELECT event_type, epoch_ms(ts) // 60000 AS m FROM events
      |), g AS (SELECT MAX(m) - MIN(m) + 1 AS n FROM ev),
      |pm AS (
      |  SELECT event_type, m, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM ev GROUP BY event_type, m
      |), per AS (
      |  SELECT event_type, CAST(SUM(c) AS BIGINT) AS s,
      |    SUM(CAST(c * c AS DECIMAL(38,0))) AS q
      |  FROM pm GROUP BY event_type
      |)
      |SELECT event_type, CAST(n AS BIGINT) AS n, s,
      |  CAST(CAST(n AS DECIMAL(38,0)) * q
      |      - CAST(s * s AS DECIMAL(38,0)) AS DOUBLE)
      |    / CAST(n * s AS DOUBLE) AS fano
      |FROM per, g ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------ fertility
  /** Tokenizer fertility per language: subword tokens (the BPE-ish
    * `[a-z]{1,4}` segmentation `text_token_stats` established) per
    * whitespace word — the per-language cost metric a tokenizer report
    * carries. Integer sums, one double division. */
  private def fertility(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"lang").agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(trim($"text"), "\\s+")).cast("long")).as("n_words"),
        sum(expr("size(regexp_extract_all(text, '[a-z]{1,4}', 0))")
          .cast("long")).as("n_subtokens"))
      .withColumn("fertility",
        $"n_subtokens".cast("double") / $"n_words".cast("double"))
      .orderBy($"lang")
  }

  private val fertilitySql =
    """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
      |    AS n_words,
      |  CAST(SUM(len(regexp_extract_all(text, '[a-z]{1,4}'))) AS BIGINT)
      |    AS n_subtokens,
      |  CAST(SUM(len(regexp_extract_all(text, '[a-z]{1,4}'))) AS DOUBLE)
      |    / CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS DOUBLE)
      |    AS fertility
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ------------------------------------------------------------------ TWAP
  /** Time-weighted average value per user (the TWAP feature — a mean
    * that a burst of quick events cannot drag): Σ valueᵢ·(tᵢ₊₁−tᵢ) over
    * the user's timeline divided by the span. Values quantize to exact
    * integer micro-units, segment products accumulate as DECIMAL(38,0)
    * (micro × ms exceeds BIGINT), and the TWAP is the one double
    * division. Zero-duration segments (tied timestamps) contribute 0
    * regardless of tie order, so the event_id tie-break never shows in
    * the answer. One shuffle on user; the per-user lead() window is the
    * operator's own partition. */
  private def twap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .withColumn("ems", epochMs($"ts"))
      .select($"user_id", $"event_id", $"ems",
        floor($"value" * 1000000.0 + 0.5).cast("long").as("micro"))
    val w = Window.partitionBy($"user_id").orderBy($"ems", $"event_id")
    val seg = ev
      .withColumn("next_ems", lead($"ems", 1).over(w))
      .filter($"next_ems".isNotNull)
      .withColumn("seg", // cast BEFORE the multiply: micro × ms overflows
        // BIGINT once spans reach years at production value ranges
        $"micro".cast(DecimalType(38, 0)) * ($"next_ems" - $"ems"))
    seg.groupBy($"user_id").agg(
        (count(lit(1)) + 1L).as("n_events"),
        (max($"next_ems") - min($"ems")).as("span_ms"),
        sum($"seg").as("integral"))
      .filter($"span_ms" > 0)
      .select($"user_id", $"n_events", $"span_ms",
        ($"integral".cast("double") / $"span_ms".cast("double") / lit(1e6))
          .as("twap"))
      .orderBy($"user_id")
  }

  private val twapSql =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ems,
      |    CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS micro
      |  FROM events
      |), seg AS (
      |  SELECT user_id, ems, micro,
      |    lead(ems, 1) OVER (PARTITION BY user_id
      |      ORDER BY ems, event_id) AS next_ems
      |  FROM ev
      |), s AS (SELECT * FROM seg WHERE next_ems IS NOT NULL)
      |SELECT user_id, CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
      |  CAST(MAX(next_ems) - MIN(ems) AS BIGINT) AS span_ms,
      |  CAST(SUM(CAST(micro * (next_ems - ems) AS DECIMAL(38,0))) AS DOUBLE)
      |    / CAST(MAX(next_ems) - MIN(ems) AS DOUBLE) / 1000000.0 AS twap
      |FROM s GROUP BY user_id HAVING MAX(next_ems) - MIN(ems) > 0
      |ORDER BY user_id""".stripMargin

  // -------------------------------------------------------- grouping sets
  /** Explicit GROUPING SETS (the general form behind the ROLLUP/CUBE
    * queries already covered): per-(returnflag, linestatus) totals, a
    * per-returnflag margin, and a grand total in ONE scan — the engine
    * expands the sets map-side instead of three query passes.
    * grouping_id disambiguates the NULL group labels in both engines. */
  private def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_returnflag"),
          Seq()),
        $"l_returnflag", $"l_linestatus")
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        dsum($"l_quantity").as("sum_qty"))
      .select($"l_returnflag", $"l_linestatus", $"gid", $"n", $"sum_qty")
      .orderBy($"gid", $"l_returnflag", $"l_linestatus")
  }

  private val groupingSetsSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_returnflag), ())
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin

  // ----------------------------------------------------------- readability
  /** Per-document readability profile (the Flesch-style shape without the
    * libm syllable constant): sentence-marker runs, whitespace words,
    * long words (≥7 chars), and the two single-division rates. All counts
    * exact BIGINT; no shuffle at all — pure per-row higher-order
    * functions inside whole-stage codegen. */
  private def readability(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("toks", split(trim($"text"), "\\s+"))
      .select($"doc_id",
        greatest(expr("size(regexp_extract_all(text, '[.!?]+', 0))")
          .cast("long"), lit(1L)).as("n_sentences"),
        size($"toks").cast("long").as("n_words"),
        expr("size(filter(toks, t -> length(t) >= 7))").cast("long")
          .as("n_long_words"))
      .withColumn("words_per_sentence",
        $"n_words".cast("double") / $"n_sentences".cast("double"))
      .withColumn("long_word_ratio",
        $"n_long_words".cast("double") / $"n_words".cast("double"))
      .orderBy($"doc_id")
  }

  private val readabilitySql =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks, text
      |  FROM documents
      |)
      |SELECT doc_id,
      |  GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1)
      |    AS n_sentences,
      |  CAST(len(toks) AS BIGINT) AS n_words,
      |  CAST(len(list_filter(toks, t -> length(t) >= 7)) AS BIGINT)
      |    AS n_long_words,
      |  CAST(len(toks) AS DOUBLE)
      |    / CAST(GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+'))
      |        AS BIGINT), 1) AS DOUBLE) AS words_per_sentence,
      |  CAST(len(list_filter(toks, t -> length(t) >= 7)) AS DOUBLE)
      |    / CAST(len(toks) AS DOUBLE) AS long_word_ratio
      |FROM d ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ ROC points
  private val rocThresholds = Seq(10, 30, 50, 70, 90)

  /** ROC operating points for the value-score against a deterministic
    * noisy label (score > 75 flipped on an md5-derived 10% — so the curve
    * has real shape): exact TP/FP/TN/FN at 5 thresholds, TPR/FPR as the
    * single divisions. The threshold fan-out is a 5-wide broadcast
    * explode; the rest is one aggregation. */
  private def rocPoints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .withColumn("h",
        conv(substring(md5($"event_id".cast("string").cast("binary")), 1, 8),
          16, 10).cast("long"))
      .select($"value",
        (($"value" > 75.0) =!= (pmod($"h", lit(10L)) === 0L)).as("pos"))
    ev.select($"value", $"pos",
        explode(array(rocThresholds.map(t => lit(t.toLong)): _*)).as("t"))
      .groupBy($"t").agg(
        sum(when($"pos" && $"value" > $"t", 1L).otherwise(0L)).as("tp"),
        sum(when(!$"pos" && $"value" > $"t", 1L).otherwise(0L)).as("fp"),
        sum(when(!$"pos" && !($"value" > $"t"), 1L).otherwise(0L)).as("tn"),
        sum(when($"pos" && !($"value" > $"t"), 1L).otherwise(0L)).as("fn"))
      .withColumn("tpr",
        $"tp".cast("double") / ($"tp" + $"fn").cast("double"))
      .withColumn("fpr",
        $"fp".cast("double") / ($"fp" + $"tn").cast("double"))
      .orderBy($"t")
  }

  private val rocPointsSql = {
    val ts = rocThresholds.mkString(", ")
    s"""WITH ev AS (
       |  SELECT value,
       |    (value > 75.0) <>
       |      (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
       |        AS BIGINT) % 10 = 0) AS pos
       |  FROM events
       |), x AS (
       |  SELECT value, pos, CAST(t AS BIGINT) AS t
       |  FROM ev, (SELECT unnest([$ts]) AS t)
       |)
       |SELECT t,
       |  CAST(SUM(CASE WHEN pos AND value > t THEN 1 ELSE 0 END) AS BIGINT)
       |    AS tp,
       |  CAST(SUM(CASE WHEN NOT pos AND value > t THEN 1 ELSE 0 END)
       |    AS BIGINT) AS fp,
       |  CAST(SUM(CASE WHEN NOT pos AND NOT (value > t) THEN 1 ELSE 0 END)
       |    AS BIGINT) AS tn,
       |  CAST(SUM(CASE WHEN pos AND NOT (value > t) THEN 1 ELSE 0 END)
       |    AS BIGINT) AS fn,
       |  CAST(SUM(CASE WHEN pos AND value > t THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM(CASE WHEN pos AND value > t THEN 1 ELSE 0 END)
       |         + SUM(CASE WHEN pos AND NOT (value > t) THEN 1 ELSE 0 END)
       |      AS DOUBLE) AS tpr,
       |  CAST(SUM(CASE WHEN NOT pos AND value > t THEN 1 ELSE 0 END)
       |      AS DOUBLE)
       |    / CAST(SUM(CASE WHEN NOT pos AND value > t THEN 1 ELSE 0 END)
       |         + SUM(CASE WHEN NOT pos AND NOT (value > t) THEN 1 ELSE 0 END)
       |      AS DOUBLE) AS fpr
       |FROM x GROUP BY t ORDER BY t""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_acf" -> (acf _),
    "text_heaps_growth" -> (heapsGrowth _),
    "rel_band_join" -> (bandJoin _),
    "ml_rank_metrics" -> (rankMetrics _),
    "emb_rrf_hybrid" -> (rrfHybrid _),
    "graph_clustering_coeff" -> (clusteringCoeff _),
    "graph_assortativity" -> (assortativity _),
    "corpus_temperature_mix" -> (temperatureMix _),
    "evt_burstiness" -> (burstiness _),
    "text_fertility" -> (fertility _),
    "evt_twap" -> (twap _),
    "rel_grouping_sets" -> (groupingSets _),
    "text_readability" -> (readability _),
    "ml_roc_points" -> (rocPoints _))

  override def oracles: Map[String, String] = Map(
    "evt_acf" -> acfSql,
    "text_heaps_growth" -> heapsGrowthSql,
    "rel_band_join" -> bandJoinSql,
    "ml_rank_metrics" -> rankMetricsSql,
    "emb_rrf_hybrid" -> rrfHybridSql,
    "graph_clustering_coeff" -> clusteringCoeffSql,
    "graph_assortativity" -> assortativitySql,
    "corpus_temperature_mix" -> temperatureMixSql,
    "evt_burstiness" -> burstinessSql,
    "text_fertility" -> fertilitySql,
    "evt_twap" -> twapSql,
    "rel_grouping_sets" -> groupingSetsSql,
    "text_readability" -> readabilitySql,
    "ml_roc_points" -> rocPointsSql)
}
