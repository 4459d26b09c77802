package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import Exact._

/** Experimentation + ranking-metric operators (ref inference/ — the
  * reference evaluates its fraud scorer and serves personalization
  * variants; these are the measurement tools that sit beside that loop):
  *
  *   - two-proportion z-test A/B analysis (counts exact BIGINT, the one
  *     shared double formula written identically in both engines);
  *   - EXACT feature AUC via the Mann-Whitney U statistic — computed from
  *     per-distinct-value aggregates with midrank algebra kept in doubled
  *     integers (2·ranksum), so the AUC is one double division of two
  *     exactly-computed integers, never a float rank sum;
  *   - item-item cosine similarity top-k (the co-occurrence
  *     recommendation primitive; support/√(n₁n₂) — sqrt is IEEE-exact);
  *   - asymmetric containment dedup (catches a short doc embedded in a
  *     long one, which symmetric Jaccard under length-banding cannot);
  *   - bounded-round k-core peel over the trade graph (community-core
  *     extraction; fixed rounds like the Bellman-Ford query, oracle
  *     unrolls them).
  *
  * 100 TB notes: AUC aggregates by distinct feature value (cardinality-
  * bounded, one shuffle + one |values| window); the A/B test is a
  * single-pass aggregation; item pairs fan out ≤ (order size choose 2)
  * per order; containment candidates come from lang buckets here and
  * from the MinHash band buckets at corpus scale (same swap note as
  * dedup_ngram_jaccard); k-core joins are node-table-bounded per round
  * with localCheckpoint against plan nesting.
  */
object AdvancedOps extends QueryModule {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).withColumn("ems", epochMs(col("ts")))

  // ------------------------------------------------------- A/B z-test
  /** Two-proportion z-test: variant = user_id parity (the deterministic
    * hash-split of an experimentation system), conversion = value > 75.
    * Counts are exact; p0/p1/pooled-p/z follow ONE shared formula whose
    * operation order is written identically in both engines. */
  private def abTest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = ev(spark, dir).select(
        ($"user_id" % 2).as("variant"),
        when($"value" > 75.0, 1L).otherwise(0L).as("conv"))
      .groupBy()
      .agg(
        sum(when($"variant" === 0, 1L).otherwise(0L)).as("n0"),
        sum(when($"variant" === 1, 1L).otherwise(0L)).as("n1"),
        sum(when($"variant" === 0, $"conv").otherwise(0L)).as("c0"),
        sum(when($"variant" === 1, $"conv").otherwise(0L)).as("c1"))
    val p0 = $"c0".cast("double") / $"n0".cast("double")
    val p1 = $"c1".cast("double") / $"n1".cast("double")
    val pp = ($"c0" + $"c1").cast("double") / ($"n0" + $"n1").cast("double")
    m.select($"n0", $"n1", $"c0", $"c1",
      p0.as("p0"), p1.as("p1"),
      ((p1 - p0) /
        sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / $"n0".cast("double") + lit(1.0) / $"n1".cast("double"))))
        .as("z"))
  }

  /** Shared with stream_ab_test. */
  private[graft] val abTestSql =
    """WITH m AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND value > 75.0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
      |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND value > 75.0 THEN 1 ELSE 0 END) AS BIGINT) AS c1
      |  FROM events)
      |SELECT n0, n1, c0, c1,
      |  CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
      |  CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
      |  (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |     - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)) /
      |  sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
      |    * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
      |    * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))) AS z
      |FROM m""".stripMargin

  // -------------------------------------------- exact Mann-Whitney AUC
  /** One-vs-rest AUC of `value` for each event_type, via the exact
    * Mann-Whitney identity AUC = U/(n₁n₀) with midranks for ties. The
    * whole computation lives on per-distinct-value aggregates: for a
    * value with t rows after c smaller rows, each row's DOUBLED midrank
    * is 2c + t + 1 (an integer — doubling clears the ½ steps), so
    * 2·ranksum = Σ pos_v·(2c + t + 1) accumulates exactly and
    * AUC = (2·ranksum − n₁(n₁+1)) / (2 n₁ n₀) is one double division.
    * One shuffle on value + one |distinct values| window — never a
    * global per-row rank. */
  private def featureAuc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val vt = e.groupBy($"value").agg(count(lit(1)).as("t"))
      .withColumn("c", sum($"t").over(
        Window.orderBy($"value")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - $"t")
    val vp = e.groupBy($"value", $"event_type").agg(count(lit(1)).as("pos"))
    val n = e.count() // driver scalar: total rows (bounded metadata)
    vp.join(vt, Seq("value"))
      .groupBy($"event_type")
      .agg(sum($"pos").as("n_pos"),
        sum($"pos" * (lit(2) * $"c" + $"t" + 1)).as("ranksum2"))
      .select($"event_type", $"n_pos".cast("long").as("n_pos"),
        (lit(n) - $"n_pos").cast("long").as("n_neg"),
        (($"ranksum2" - $"n_pos" * ($"n_pos" + 1)).cast("double") /
          (lit(2L) * $"n_pos" * (lit(n) - $"n_pos")).cast("double")).as("auc"))
      .orderBy($"event_type")
  }

  private val featureAucSql =
    """WITH vt AS (
      |  SELECT value, count(*) AS t FROM events GROUP BY 1
      |), vc AS (
      |  SELECT value, t,
      |    SUM(t) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t AS c
      |  FROM vt
      |), vp AS (
      |  SELECT value, event_type, count(*) AS pos FROM events GROUP BY 1, 2
      |), n AS (SELECT count(*) AS n FROM events)
      |SELECT vp.event_type,
      |  CAST(SUM(vp.pos) AS BIGINT) AS n_pos,
      |  CAST(n.n - SUM(vp.pos) AS BIGINT) AS n_neg,
      |  CAST(SUM(vp.pos * (2 * vc.c + vc.t + 1))
      |       - SUM(vp.pos) * (SUM(vp.pos) + 1) AS DOUBLE)
      |    / CAST(2 * SUM(vp.pos) * (n.n - SUM(vp.pos)) AS DOUBLE) AS auc
      |FROM vp JOIN vc ON vp.value = vc.value CROSS JOIN n
      |GROUP BY vp.event_type, n.n
      |ORDER BY vp.event_type""".stripMargin

  // --------------------------------------------- learning curve (AUC)
  /** Sample-sufficiency harness: the exact Mann-Whitney AUC of `value`
    * for the purchase-vs-rest label, recomputed on NESTED deterministic
    * samples of 1/8, 1/4, 1/2 and all of the data (row in sample l/8 iff
    * md5(event_id) mod 8 < l — nesting is what makes the curve read as
    * "what would less data have told me", the flattening tail = enough
    * data). One scan: each row fans out to the samples containing it
    * (≤ 4×), then the [[featureAuc]] midrank algebra runs per sample —
    * all integer moments, one double division per sample. */
  private def learningCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
      .withColumn("h8",
        pmod(conv(substring(md5($"event_id".cast("string").cast("binary")),
          1, 8), 16, 10).cast("long"), lit(8L)))
      .select($"value", ($"event_type" === "purchase").as("pos"), $"h8",
        explode(array(lit(1L), lit(2L), lit(4L), lit(8L))).as("l"))
      .filter($"h8" < $"l")
      .drop("h8")
    val vt = e.groupBy($"l", $"value").agg(count(lit(1)).as("t"))
      .withColumn("c", sum($"t").over(
        Window.partitionBy($"l").orderBy($"value")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - $"t")
    val vp = e.groupBy($"l", $"value")
      .agg(sum(when($"pos", 1L).otherwise(0L)).as("pos_n"))
    val n = e.groupBy($"l").agg(count(lit(1)).as("n"))
    vp.join(vt, Seq("l", "value")).join(n, Seq("l"))
      .groupBy($"l", $"n")
      .agg(sum($"pos_n").as("n_pos"),
        sum($"pos_n" * (lit(2) * $"c" + $"t" + 1)).as("ranksum2"))
      .select($"l".as("eighths"), $"n",
        $"n_pos".cast("long").as("n_pos"),
        ($"n" - $"n_pos").cast("long").as("n_neg"),
        (($"ranksum2" - $"n_pos" * ($"n_pos" + 1)).cast("double") /
          (lit(2L) * $"n_pos" * ($"n" - $"n_pos")).cast("double")).as("auc"))
      .orderBy($"eighths")
  }

  private val learningCurveSql =
    """WITH e AS (
      |  SELECT value, (event_type = 'purchase') AS pos, l
      |  FROM (SELECT value, event_type,
      |          CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
      |            AS BIGINT) % 8 AS h8
      |        FROM events),
      |       (SELECT unnest([1, 2, 4, 8]) AS l)
      |  WHERE h8 < l
      |), vt AS (
      |  SELECT l, value, count(*) AS t FROM e GROUP BY 1, 2
      |), vc AS (
      |  SELECT l, value, t,
      |    SUM(t) OVER (PARTITION BY l ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t AS c
      |  FROM vt
      |), vp AS (
      |  SELECT l, value,
      |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS pos_n
      |  FROM e GROUP BY 1, 2
      |), n AS (SELECT l, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1)
      |SELECT CAST(vp.l AS BIGINT) AS eighths, n.n,
      |  CAST(SUM(vp.pos_n) AS BIGINT) AS n_pos,
      |  CAST(n.n - SUM(vp.pos_n) AS BIGINT) AS n_neg,
      |  CAST(SUM(vp.pos_n * (2 * vc.c + vc.t + 1))
      |       - SUM(vp.pos_n) * (SUM(vp.pos_n) + 1) AS DOUBLE)
      |    / CAST(2 * SUM(vp.pos_n) * (n.n - SUM(vp.pos_n)) AS DOUBLE) AS auc
      |FROM vp JOIN vc ON vp.l = vc.l AND vp.value = vc.value
      |JOIN n ON n.l = vp.l
      |GROUP BY vp.l, n.n ORDER BY eighths""".stripMargin

  // ------------------------------------------- item-item similarity
  /** Item-item cosine similarity over order co-occurrence: for each part,
    * the top-3 most co-ordered parts by support/√(n₁n₂) (support ≥ 2).
    * The normalized sibling of rel_market_basket's lift — cosine rewards
    * symmetric affinity, lift rewards rarity. Pair fan-out bounded by
    * order size; item counts broadcast; per-item ranking is a window
    * over the (bounded) pair table. */
  private def itemSimilarity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val io = Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
    val itemN = io.groupBy($"pk").agg(count(lit(1)).as("n_item"))
    val pairs = io.as("a")
      .join(io.as("b"), col("a.ok") === col("b.ok") &&
        col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .groupBy($"p1", $"p2").agg(count(lit(1)).as("support"))
      .filter($"support" >= 2)
    val sym = pairs.unionByName(
      pairs.select($"p2".as("p1"), $"p1".as("p2"), $"support"))
    val scored = sym
      .join(broadcast(itemN.withColumnRenamed("pk", "p1")
        .withColumnRenamed("n_item", "n1")), Seq("p1"))
      .join(broadcast(itemN.withColumnRenamed("pk", "p2")
        .withColumnRenamed("n_item", "n2")), Seq("p2"))
      .withColumn("sim", $"support".cast("double") /
        sqrt(($"n1" * $"n2").cast("double")))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy($"p1").orderBy($"sim".desc, $"p2")).cast("long"))
      .filter($"rk" <= 3)
      .select($"p1", $"rk", $"p2", $"support", $"sim")
      .orderBy($"p1", $"rk")
  }

  private val itemSimilaritySql =
    """WITH io AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), item_n AS (
      |  SELECT pk, count(*) AS n_item FROM io GROUP BY 1
      |), pairs AS (
      |  SELECT a.pk AS p1, b.pk AS p2, count(*) AS support
      |  FROM io a JOIN io b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |), sym AS (
      |  SELECT p1, p2, support FROM pairs
      |  UNION ALL SELECT p2 AS p1, p1 AS p2, support FROM pairs
      |), scored AS (
      |  SELECT s.p1, s.p2, s.support,
      |    CAST(s.support AS DOUBLE)
      |      / sqrt(CAST(i1.n_item * i2.n_item AS DOUBLE)) AS sim
      |  FROM sym s
      |  JOIN item_n i1 ON i1.pk = s.p1
      |  JOIN item_n i2 ON i2.pk = s.p2)
      |SELECT p1, rk, p2, support, sim FROM (
      |  SELECT p1, p2, support, sim, CAST(row_number() OVER (
      |    PARTITION BY p1 ORDER BY sim DESC, p2) AS BIGINT) AS rk
      |  FROM scored)
      |WHERE rk <= 3 ORDER BY p1, rk""".stripMargin

  // ----------------------------------------------- containment dedup
  /** Asymmetric containment dedup: containment(A→B) = |A∩B| / |A| finds a
    * short document embedded in a longer one — the case symmetric Jaccard
    * under length-banding structurally misses. Same hashed-shingle +
    * codegen'd two-pointer intersect machinery as dedup_ngram_jaccard.
    *
    * Candidates come from an asymmetric PREFIX FILTER (round-8 verdict
    * #3 — the previous lang-bucketed all-pairs join was the suite's one
    * quadratic candidate generator): containment(A→B) ≥ t forces
    * |A∩B| ≥ ⌈t·|A|⌉, so under ANY consistent global shingle order A
    * must share a shingle with B within A's first |A| − ⌈t·|A|⌉ + 1
    * shingles. B gets NO prefix (the containing side can be arbitrarily
    * large), so the join is A-prefix shingles against B's full inverted
    * index — output bounded by Σ df(prefix shingle), never |docs|².
    * The prefix ORDER is chosen by a measured skew probe (round 10 —
    * closing the round-9 "one freq join away" note): any consistent
    * total shingle order is COMPLETE, so the choice is pure cost. The
    * HASH order the `sh` arrays already carry is free, and the round-9
    * bench showed the textbook df-ascending prefix (a frequency pass +
    * per-doc re-sort) costing 2.3× more than it pruned on this corpus,
    * whose near-uniform df gives the ordering nothing to exploit. On a
    * Zipf-headed corpus the balance flips: a hot shingle lands in ~half
    * of all hash-ordered prefixes and candidate volume goes ~Σ df(hot)²
    * — quadratic in docs since df(hot) ∝ docs — while df-ascending
    * keeps hot shingles out of every prefix (they sort LAST; a prefix
    * is the low-df half). The probe measures exactly the quantity that
    * drives that cost on a doc_id-sampled 10%: the size-biased mean df
    * (Σdf²/Σdf — the expected df of a random prefix slot) over the
    * plain mean; ratio ≥ 4 → df order (measured: 1.04-1.26 on the real
    * corpora at sf0.01/0.1 → hash; ~6 at 1× and ~48 at 10× on
    * ScaleCheck's Zipf corpus → df, with the measured win in
    * ARCHITECTURE.md). (The displayed score
    * rounds to 6 decimals, which could only admit a sub-threshold pair
    * once |A| exceeds ~10⁶ shingles — document-length bound, not corpus
    * bound.) Same-lang constraint and top-50 directed pairs with
    * containment ≥ 0.5 kept from the original semantics; the oracle's
    * all-pairs form is unchanged, which also PROVES completeness: the
    * candidate cut must lose nothing or the hash check fails. */
  private def containment(spark: SparkSession, dir: String): DataFrame =
    containmentWith(spark, dir, "auto")

  /** `order`: "hash" | "df" | "auto" (probe decides). Exposed for
    * ScaleCheck's side-by-side growth measurement; the registered query
    * always runs "auto". */
  private[graft] def containmentWith(spark: SparkSession, dir: String,
      order: String): DataFrame = {
    graft.functions.SortedIntersectCount.register(spark)
    val sh = Tables.documents(spark, dir)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .select(col("doc_id"), col("lang"),
        expr("""array_sort(array_distinct(transform(sequence(1, size(toks) - 2),
          i -> cast(conv(substring(md5(cast(concat_ws(' ', element_at(toks, i),
                 element_at(toks, i + 1), element_at(toks, i + 2)) as binary)),
                 1, 15), 16, 10) as bigint))))""").as("sh"))
      // prefix for t = 0.5 is n − ⌈n/2⌉ + 1 = n − (n+1) div 2 + 1, integer
      .withColumn("plen",
        (size(col("sh")).cast("long") - expr("(size(sh) + 1) div 2") + 1)
          .cast("int"))
      .persist() // feeds the prefix explode, the inverted index, and both
                 // scoring joins — one scan, not four
    val chosen =
      if (order != "auto") order
      else {
        val ratio = sh.filter(col("doc_id") % 10 === 0)
          .select(explode(col("sh")).as("h"))
          .groupBy(col("h")).agg(count(lit(1)).as("df"))
          .agg(coalesce(
            sum(col("df") * col("df")).cast("double") / sum(col("df"))
              / avg(col("df")), lit(1.0)).as("r"))
          .collect()(0).getDouble(0)
        if (ratio >= 4.0) "df" else "hash"
      }
    val pa =
      if (chosen == "hash")
        sh.select(col("lang"), col("doc_id").as("doc_a"),
          explode(expr("slice(sh, 1, plen)")).as("h"))
      else {
        // df-ascending prefix: one freq aggregation over the exploded
        // shingles, a per-doc (df, h) sort, prefix from that order —
        // hot shingles sort last and never enter a prefix, so prefix
        // df stays ~1 under a Zipf head. Worth its extra shuffle only
        // when the probe says the head exists.
        val dfreq = sh.select(explode(col("sh")).as("h"))
          .groupBy(col("h")).agg(count(lit(1)).as("df"))
        sh.select(col("doc_id"), col("lang"), col("plen"),
            explode(col("sh")).as("h"))
          .join(dfreq, Seq("h"))
          .groupBy(col("doc_id"), col("lang"), col("plen"))
          .agg(expr("sort_array(collect_list(struct(df, h)))").as("ord"))
          .select(col("lang"), col("doc_id").as("doc_a"),
            explode(expr("transform(slice(ord, 1, plen), s -> s.h)"))
              .as("h"))
      }
    val cand = pa
      .join(sh.select(col("lang"), col("doc_id").as("doc_b"),
        explode(col("sh")).as("h")), Seq("lang", "h"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val out = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter", expr("sorted_intersect_count(sh_a, sh_b)"))
      .withColumn("containment",
        round(col("inter") / size(col("sh_a")).cast("double"), 6))
      .filter(col("containment") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("inter").cast("long").as("inter"),
        col("containment"))
      .orderBy(col("containment").desc, col("doc_a"), col("doc_b"))
      .limit(50)
    graft.core.CachePin.sealAndRelease(out, sh)
  }

  private val containmentSql =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |), sh AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> CAST(('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15)) AS BIGINT))) AS sh
      |  FROM t
      |), pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
      |    len(a.sh) AS na
      |  FROM sh a JOIN sh b
      |    ON a.lang = b.lang AND a.doc_id <> b.doc_id)
      |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
      |  ROUND(inter / CAST(na AS DOUBLE), 6) AS containment
      |FROM pairs
      |WHERE ROUND(inter / CAST(na AS DOUBLE), 6) >= 0.5
      |ORDER BY containment DESC, doc_a, doc_b LIMIT 50""".stripMargin

  // ------------------------------------------------- k-core peel
  /** Bounded-round k-core extraction (k = 3, 3 peels) on the
    * supplier↔customer trade graph: each round drops nodes with degree
    * < 3 among survivors — the standard community-core filter. Rounds are
    * FIXED (the Bellman-Ford discipline: deterministic output whether or
    * not converged, oracle unrolls them); per-round work is one
    * node-bounded aggregation + semi-joins, localCheckpoint against plan
    * nesting. */
  private def kcore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // shared session-cached symmetric edge table (round 14, TradeGraph):
    // already localCheckpoint'd — lineage-truncated for the peel rounds,
    // no per-invocation rebuild, no persist() pin re-entering each
    // round's plan
    val edges = TradeGraph.symEdges(spark, dir)
    var nodes = edges.select($"src".as("id")).distinct()
    for (_ <- 1 to 3) {
      val deg = edges
        .join(nodes.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
        .join(nodes.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
        .groupBy($"src").agg(count(lit(1)).as("deg"))
      nodes = deg.filter($"deg" >= 3).select($"src".as("id"))
        .localCheckpoint(true)
    }
    val finalDeg = edges
      .join(nodes.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(nodes.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .groupBy($"src").agg(count(lit(1)).as("deg"))
    // top-50 via TakeOrdered (orderBy+limit), THEN rank the 50 survivors —
    // never a global row_number window over the full node table
    val top = finalDeg.select($"src".as("id"), $"deg")
      .orderBy($"deg".desc, $"id").limit(50)
    top
      .select(row_number().over(Window.orderBy($"deg".desc, $"id"))
          .cast("long").as("rank"), $"id", $"deg")
      .orderBy($"rank")
  }

  private val kcoreSql = {
    val rounds = (1 to 3).map { r =>
      s"""n$r AS MATERIALIZED (
         |  SELECT src AS id FROM (
         |    SELECT e.src, count(*) AS deg
         |    FROM e
         |    JOIN n${r - 1} a ON e.src = a.id
         |    JOIN n${r - 1} b ON e.dst = b.id
         |    GROUP BY e.src)
         |  WHERE deg >= 3)""".stripMargin
    }.mkString(", ")
    s"""WITH rel AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey * 2 AS src, o_custkey * 2 + 1 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS MATERIALIZED (
       |  SELECT src, dst FROM rel
       |  UNION ALL SELECT dst AS src, src AS dst FROM rel),
       |n0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM e),
       |$rounds,
       |fd AS (
       |  SELECT e.src AS id, count(*) AS deg
       |  FROM e
       |  JOIN n3 a ON e.src = a.id
       |  JOIN n3 b ON e.dst = b.id
       |  GROUP BY e.src)
       |SELECT rank, id, deg FROM (
       |  SELECT CAST(row_number() OVER (ORDER BY deg DESC, id) AS BIGINT)
       |    AS rank, id, CAST(deg AS BIGINT) AS deg
       |  FROM fd)
       |WHERE rank <= 50 ORDER BY rank""".stripMargin
  }

  // --------------------------- Brown double exponential smoothing
  /** Per-user Brown double exponential smoothing (α = 0.25, the evt_ewma
    * constant): s₁' = αx + (1−α)s₁ and the second smoothing in its
    * EXPANDED old-state form s₂' = α²x + α(1−α)s₁ + (1−α)s₂ (all
    * binary-exact constants; algebraically the textbook s₂' = αs₁' +
    * (1−α)s₂). level = 2s₁ − s₂, trend = (α/(1−α))(s₁−s₂) = (s₁−s₂)/3,
    * forecast₁ = level + trend — the trend-aware upgrade of evt_ewma.
    *
    * The expansion matters cross-engine: DuckDB 1.0.0's list_reduce
    * evaluates struct-accumulator fields SEQUENTIALLY from the second
    * application on (a later field referencing an earlier one reads the
    * freshly UPDATED value — measured in round 7; the first application
    * is simultaneous), so a correct shared fold must only reference
    * own-or-later fields and the element. The expanded form does exactly
    * that ('s2' listed first, referencing s1 forward); the naive
    * "recompute l' inside b'" Holt form silently diverges. Shared by the
    * streaming twin (stream_brown, 4-primitive state). */
  private def brown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ev(spark, dir)
      .groupBy($"user_id")
      .agg(expr("transform(array_sort(collect_list(struct(ems, event_id," +
        " value))), p -> p.value)").as("vs"))
      .select($"user_id", size($"vs").cast("long").as("n_events"),
        expr("""aggregate(slice(vs, 2, size(vs) - 1),
          named_struct('s2', vs[0], 's1', vs[0]),
          (acc, x) -> named_struct(
            's2', 0.0625D * x + 0.1875D * acc.s1 + 0.75D * acc.s2,
            's1', 0.25D * x + 0.75D * acc.s1))""").as("f"))
      .select($"user_id", $"n_events",
        (lit(2.0) * $"f".getField("s1") - $"f".getField("s2")).as("level"),
        (($"f".getField("s1") - $"f".getField("s2")) / lit(3.0)).as("trend"),
        ((lit(2.0) * $"f".getField("s1") - $"f".getField("s2")) +
          ($"f".getField("s1") - $"f".getField("s2")) / lit(3.0))
          .as("forecast_1"))
      .orderBy($"user_id")
  }

  /** Shared with stream_brown. */
  private[graft] val brownSql =
    """WITH s AS (
      |  SELECT user_id, list(value ORDER BY epoch_ms(ts), event_id) AS vs
      |  FROM events GROUP BY 1
      |), f AS (
      |  SELECT user_id, CAST(len(vs) AS BIGINT) AS n_events,
      |    list_reduce(
      |      list_prepend({'s2': vs[1], 's1': vs[1]},
      |        list_transform(vs[2:], e -> {'s2': e, 's1': e})),
      |      (acc, x) -> {
      |        's2': 0.0625 * x.s1 + 0.1875 * acc.s1 + 0.75 * acc.s2,
      |        's1': 0.25 * x.s1 + 0.75 * acc.s1}) AS f
      |  FROM s)
      |SELECT user_id, n_events,
      |  2.0 * f.s1 - f.s2 AS level,
      |  (f.s1 - f.s2) / 3.0 AS trend,
      |  (2.0 * f.s1 - f.s2) + (f.s1 - f.s2) / 3.0 AS forecast_1
      |FROM f ORDER BY user_id""".stripMargin

  // ------------------------------------------- seasonal decomposition+SES
  /** Seasonal forecast: additive seasonal decomposition + Brown double
    * smoothing on the deseasonalized series — the classical
    * decompose-then-smooth pipeline (period = 4 six-hour phases, the
    * diurnal cycle). Why not coupled Holt-Winters HERE: its level↔trend
    * recurrence is CYCLIC, and DuckDB 1.0.0's list_reduce evaluates
    * struct fields sequentially from the 2nd application on (see
    * AdvancedOps.brown / CLAUDE.md), so one of the pair must read the
    * other's old value as an earlier field — unreachable BY FOLD;
    * Brown's cascade is acyclic, which is exactly why it folds exactly.
    * (Round 8 closed the coupled form by the other route — fixed-length
    * series + per-step unrolled CTEs + integer scaling: see
    * [[holtForecast]] and the full [[holtWinters]]. This query remains
    * the unbounded-length form the fold supports.)
    * Stages: per-phase seasonal mean (exact davg from RAW events, never
    * re-averaged doubles), per-bucket mean, residual = y − s(phase)
    * (broadcast join), one bucket-domain-bounded Brown fold; forecast
    * recombines level + trend + next phase's seasonal. */
  private def seasonalForecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir).select($"value", expr("ems div 21600000").as("b"))
    val season = e.groupBy(pmod($"b", lit(4L)).as("p"))
      .agg(davg($"value").as("s"))
    val sRow = season.agg(
      max(when($"p" === 0L, $"s")).as("sea0"),
      max(when($"p" === 1L, $"s")).as("sea1"),
      max(when($"p" === 2L, $"s")).as("sea2"),
      max(when($"p" === 3L, $"s")).as("sea3"))
    val resid = e.groupBy($"b").agg(davg($"value").as("y"))
      .join(broadcast(season), pmod($"b", lit(4L)) === $"p")
      .select($"b", ($"y" - $"s").as("r"))
    val ser = resid.agg(
      expr("transform(array_sort(collect_list(struct(b, r))), q -> q.r)")
        .as("rs"),
      max($"b").as("maxb"), count(lit(1)).as("n_buckets"))
    ser.select($"n_buckets", $"maxb",
        expr("""aggregate(slice(rs, 2, size(rs) - 1),
          named_struct('s2', rs[0], 's1', rs[0]),
          (acc, x) -> named_struct(
            's2', 0.0625D * x + 0.1875D * acc.s1 + 0.75D * acc.s2,
            's1', 0.25D * x + 0.75D * acc.s1))""").as("f"))
      .crossJoin(broadcast(sRow))
      .select($"n_buckets", $"sea0", $"sea1", $"sea2", $"sea3",
        (lit(2.0) * $"f".getField("s1") - $"f".getField("s2")).as("level"),
        (($"f".getField("s1") - $"f".getField("s2")) / lit(3.0)).as("trend"),
        ((lit(2.0) * $"f".getField("s1") - $"f".getField("s2")) +
          ($"f".getField("s1") - $"f".getField("s2")) / lit(3.0) +
          when(pmod($"maxb" + 1L, lit(4L)) === 0L, $"sea0")
            .when(pmod($"maxb" + 1L, lit(4L)) === 1L, $"sea1")
            .when(pmod($"maxb" + 1L, lit(4L)) === 2L, $"sea2")
            .otherwise($"sea3")).as("forecast_1"))
  }

  private val seasonalForecastSql =
    """WITH e AS (
      |  SELECT value, epoch_ms(ts) // 21600000 AS b FROM events
      |), season AS (
      |  SELECT b % 4 AS p,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / count(value)
      |      AS s
      |  FROM e GROUP BY 1
      |), srow AS (
      |  SELECT max(CASE WHEN p = 0 THEN s END) AS sea0,
      |    max(CASE WHEN p = 1 THEN s END) AS sea1,
      |    max(CASE WHEN p = 2 THEN s END) AS sea2,
      |    max(CASE WHEN p = 3 THEN s END) AS sea3
      |  FROM season
      |), buckets AS (
      |  SELECT b,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / count(value)
      |      AS y
      |  FROM e GROUP BY 1
      |), resid AS (
      |  SELECT bu.b, bu.y - se.s AS r
      |  FROM buckets bu JOIN season se ON bu.b % 4 = se.p
      |), ser AS (
      |  SELECT list(r ORDER BY b) AS rs, max(b) AS maxb,
      |    count(*) AS n_buckets
      |  FROM resid
      |), f AS (
      |  SELECT CAST(n_buckets AS BIGINT) AS n_buckets, maxb,
      |    list_reduce(
      |      list_prepend({'s2': rs[1], 's1': rs[1]},
      |        list_transform(rs[2:], e -> {'s2': e, 's1': e})),
      |      (acc, x) -> {
      |        's2': 0.0625 * x.s1 + 0.1875 * acc.s1 + 0.75 * acc.s2,
      |        's1': 0.25 * x.s1 + 0.75 * acc.s1}) AS f
      |  FROM ser)
      |SELECT n_buckets, sea0, sea1, sea2, sea3,
      |  2.0 * f.s1 - f.s2 AS level,
      |  (f.s1 - f.s2) / 3.0 AS trend,
      |  (2.0 * f.s1 - f.s2) + (f.s1 - f.s2) / 3.0 +
      |    CASE (maxb + 1) % 4 WHEN 0 THEN sea0 WHEN 1 THEN sea1
      |      WHEN 2 THEN sea2 ELSE sea3 END AS forecast_1
      |FROM f CROSS JOIN srow""".stripMargin

  // ------------------------------------------------- k-anonymity gate
  /** k-anonymity publication gate (k = 10): aggregates over the
    * quasi-identifier (event_type, k-bucket from props) are published only
    * when the group holds ≥ k distinct users — the privacy floor an
    * analytics export applies before leaving the trust boundary.
    * Suppressed-group/row totals ride along as audit columns. Single-pass
    * aggregation; the 1-row audit summary is broadcast back. */
  private def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = ev(spark, dir)
      .select($"event_type",
        expr("CAST(get_json_object(props, '$.k') AS LONG) div 10")
          .as("kbucket"),
        $"user_id", $"value")
      .groupBy($"event_type", $"kbucket")
      .agg(countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_rows"), dsum($"value").as("sum_value"))
    val audit = g.agg(
      sum(when($"n_users" < 10, 1L).otherwise(0L)).as("suppressed_groups"),
      sum(when($"n_users" < 10, $"n_rows").otherwise(0L)).as("suppressed_rows"))
    g.filter($"n_users" >= 10)
      .crossJoin(broadcast(audit))
      .orderBy($"event_type", $"kbucket")
  }

  private val kAnonymitySql =
    """WITH g AS (
      |  SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS kbucket,
      |    count(DISTINCT user_id) AS n_users, count(*) AS n_rows,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      |  FROM events GROUP BY 1, 2
      |), audit AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN n_users < 10 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS suppressed_groups,
      |    CAST(SUM(CASE WHEN n_users < 10 THEN n_rows ELSE 0 END) AS BIGINT)
      |      AS suppressed_rows
      |  FROM g)
      |SELECT event_type, kbucket, n_users, n_rows, sum_value,
      |  suppressed_groups, suppressed_rows
      |FROM g CROSS JOIN audit
      |WHERE n_users >= 10
      |ORDER BY event_type, kbucket""".stripMargin

  // ------------------------------------------------- l-diversity gate
  /** l-diversity publication gate (l = 3): k-anonymity's k-distinct-users
    * floor still leaks when everyone in a group shares the sensitive
    * value, so the export additionally requires ≥ l DISTINCT sensitive
    * values per quasi-identifier group (Machanavajjhala et al., ICDE'06).
    * Quasi-identifier = (event_type, k-bucket); sensitive attribute =
    * the value decile. Same single-pass + broadcast-audit shape as
    * [[kAnonymity]]; at 100 TB both gates are one shuffle on the
    * quasi-identifier. */
  private def lDiversity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = ev(spark, dir)
      .select($"event_type",
        expr("CAST(get_json_object(props, '$.k') AS LONG) div 10")
          .as("kbucket"),
        expr("CAST(FLOOR(value) AS LONG) div 10").as("sensitive"),
        $"user_id", $"value")
      .groupBy($"event_type", $"kbucket")
      .agg(countDistinct($"user_id").as("n_users"),
        countDistinct($"sensitive").as("l_div"),
        count(lit(1)).as("n_rows"), dsum($"value").as("sum_value"))
    val audit = g.agg(
      sum(when($"n_users" < 10 || $"l_div" < 3, 1L).otherwise(0L))
        .as("suppressed_groups"),
      sum(when($"n_users" >= 10 && $"l_div" < 3, 1L).otherwise(0L))
        .as("k_pass_l_fail_groups"))
    g.filter($"n_users" >= 10 && $"l_div" >= 3)
      .crossJoin(broadcast(audit))
      .orderBy($"event_type", $"kbucket")
  }

  private val lDiversitySql =
    """WITH g AS (
      |  SELECT event_type,
      |    CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS kbucket,
      |    count(DISTINCT user_id) AS n_users,
      |    count(DISTINCT CAST(FLOOR(value) AS BIGINT) // 10) AS l_div,
      |    count(*) AS n_rows,
      |    CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      |  FROM events GROUP BY 1, 2
      |), audit AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN n_users < 10 OR l_div < 3 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS suppressed_groups,
      |    CAST(SUM(CASE WHEN n_users >= 10 AND l_div < 3 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS k_pass_l_fail_groups
      |  FROM g)
      |SELECT event_type, kbucket, n_users, l_div, n_rows, sum_value,
      |  suppressed_groups, k_pass_l_fail_groups
      |FROM g CROSS JOIN audit
      |WHERE n_users >= 10 AND l_div >= 3
      |ORDER BY event_type, kbucket""".stripMargin

  // -------------------------------------------- time-to-convert funnel
  /** Signup→purchase latency distribution: per user, minutes from the
    * FIRST signup to the first purchase AT-OR-AFTER it (the funnel
    * queries' ordering convention); distribution summarized with the
    * suite's exact-percentile ROUND(...,6) parity discipline. Two
    * entity-key aggregations + one broadcast-size summary. */
  private def timeToConvert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val s = e.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ems").as("signup_ems"))
    val latency = e.filter($"event_type" === "purchase")
      .join(s, Seq("user_id"))
      .filter($"ems" >= $"signup_ems")
      .groupBy($"user_id")
      .agg(expr("(min(ems) - any_value(signup_ems)) div 60000")
        .cast("long").as("mins"))
    latency.agg(count(lit(1)).as("n_converted"),
        min($"mins").as("min_mins"),
        expr("round(percentile(mins, 0.5), 6)").as("median_mins"),
        expr("round(percentile(mins, 0.9), 6)").as("p90_mins"),
        max($"mins").as("max_mins"))
  }

  private val timeToConvertSql =
    """WITH s AS (
      |  SELECT user_id, min(epoch_ms(ts)) AS signup_ems
      |  FROM events WHERE event_type = 'signup' GROUP BY 1
      |), lat AS (
      |  SELECT e.user_id,
      |    (min(epoch_ms(e.ts)) - any_value(s.signup_ems)) // 60000 AS mins
      |  FROM events e JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= s.signup_ems
      |  GROUP BY e.user_id)
      |SELECT count(*) AS n_converted,
      |  min(mins) AS min_mins,
      |  ROUND(quantile_cont(mins, 0.5), 6) AS median_mins,
      |  ROUND(quantile_cont(mins, 0.9), 6) AS p90_mins,
      |  max(mins) AS max_mins
      |FROM lat""".stripMargin

  // ------------------------------------------------------ winsorization
  /** Winsorized feature transform per event_type: values clipped to the
    * [p05, p95] cut points (round-6 percentile parity), clip counts +
    * the DECIMAL-exact winsorized sum — the outlier-robust preprocessing
    * twin of quality_iqr_outliers that REPLACES instead of dropping. */
  /** The per-type [p05, p95] cut points — shared with the streaming twin
    * (stream_winsorize), which broadcasts them into the replay stream. */
  private[graft] def winsorizeCuts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ev(spark, dir).groupBy($"event_type")
      .agg(expr("round(percentile(value, 0.05), 6)").as("p05"),
        expr("round(percentile(value, 0.95), 6)").as("p95"))
  }

  private def winsorize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = ev(spark, dir)
    val cuts = winsorizeCuts(spark, dir)
    e.join(broadcast(cuts), Seq("event_type"))
      .withColumn("w", least(greatest($"value", $"p05"), $"p95"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(when($"value" < $"p05", 1L).otherwise(0L)).as("n_clipped_low"),
        sum(when($"value" > $"p95", 1L).otherwise(0L)).as("n_clipped_high"),
        first($"p05").as("p05"), first($"p95").as("p95"),
        dsum($"w").as("sum_winsorized"))
      .orderBy($"event_type")
  }

  /** Shared with stream_winsorize. */
  private[graft] val winsorizeSql =
    """WITH cuts AS (
      |  SELECT event_type,
      |    ROUND(quantile_cont(value, 0.05), 6) AS p05,
      |    ROUND(quantile_cont(value, 0.95), 6) AS p95
      |  FROM events GROUP BY 1)
      |SELECT e.event_type, count(*) AS n,
      |  CAST(SUM(CASE WHEN e.value < c.p05 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped_low,
      |  CAST(SUM(CASE WHEN e.value > c.p95 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped_high,
      |  any_value(c.p05) AS p05, any_value(c.p95) AS p95,
      |  CAST(SUM(CAST(LEAST(GREATEST(e.value, c.p05), c.p95)
      |    AS DECIMAL(25,6))) AS DOUBLE) AS sum_winsorized
      |FROM events e JOIN cuts c ON e.event_type = c.event_type
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  // ------------------------------------------------- link prediction
  /** Adamic-Adar link prediction over the bipartite trade graph:
    * supplier pairs ranked by their shared customers, each shared
    * customer weighted down by its degree — the classic
    * Σ 1/log(deg) score with the suite's integer-log surrogate
    * (1000000 div bitlen(deg), bitlen = length(bin(deg)) — ln is
    * libm-dependent and breaks bit-exact oracles, the HLL/LM rule).
    * All-integer scores; fan-out = Σ deg(customer)² — bounded by the
    * co-purchase density, never suppliers²; at 100 TB hub customers
    * get a degree cap (they contribute ~0 weight anyway). Top 50
    * predicted links. */
  private def linkPrediction(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // shared session-cached directed pair set (round 14, TradeGraph)
    val rel = TradeGraph.rawPairs(spark, dir).select($"s", $"c")
    val deg = rel.groupBy($"c").agg(count(lit(1)).as("dc"))
    val weighted = rel.join(broadcast(deg), Seq("c"))
      .withColumn("w", expr("1000000 div length(bin(dc))"))
    weighted.as("a").join(weighted.as("b"),
        col("a.c") === col("b.c") && col("a.s") < col("b.s"))
      .select(col("a.s").as("s1"), col("b.s").as("s2"), col("a.w").as("w"))
      .groupBy($"s1", $"s2")
      .agg(count(lit(1)).as("common_customers"),
        sum($"w").as("aa_millionths"))
      .orderBy($"aa_millionths".desc, $"s1", $"s2")
      .limit(50)
  }

  private val linkPredictionSql =
    """WITH rel AS (
      |  SELECT DISTINCT l_suppkey AS s, o_custkey AS c
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |), deg AS (
      |  SELECT c, count(*) AS dc FROM rel GROUP BY 1
      |), w AS (
      |  SELECT rel.s, rel.c, 1000000 // length(bin(deg.dc)) AS w
      |  FROM rel JOIN deg ON rel.c = deg.c)
      |SELECT a.s AS s1, b.s AS s2, count(*) AS common_customers,
      |  CAST(SUM(a.w) AS BIGINT) AS aa_millionths
      |FROM w a JOIN w b ON a.c = b.c AND a.s < b.s
      |GROUP BY 1, 2
      |ORDER BY aa_millionths DESC, s1, s2
      |LIMIT 50""".stripMargin

  // --------------------------------------------------- pinball loss
  /** Quantile-regression evaluation: the pinball (quantile) loss of the
    * per-type q90 predictor at τ = 0.9, entirely in DECIMAL algebra —
    * y and ŷ carry ≤ 6 decimals, τ is an exact decimal literal, every
    * per-row loss is a DECIMAL(·,7) product and the sum is exact; the
    * only double op is the final mean division. The metric that grades
    * a quantile forecaster (and, at τ = 0.9, SHOULD leave ~10% of rows
    * above the predictor — over_rate reports exactly that). */
  private def pinballLoss(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tau = lit(new java.math.BigDecimal("0.9"))
    val e = ev(spark, dir)
    val cuts = e.groupBy($"event_type")
      .agg(expr("round(percentile(value, 0.9), 6)").as("p90"))
    e.join(broadcast(cuts), Seq("event_type"))
      .withColumn("yd", $"value".cast(DecimalType(25, 6)))
      .withColumn("pd", $"p90".cast(DecimalType(25, 6)))
      .withColumn("loss",
        when($"yd" >= $"pd", tau * ($"yd" - $"pd"))
          .otherwise((lit(new java.math.BigDecimal("0.1"))) * ($"pd" - $"yd")))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), first($"p90").as("p90"),
        sum(when($"yd" > $"pd", 1L).otherwise(0L)).as("n_over"),
        (sum($"loss").cast("double") / count(lit(1))).as("mean_pinball"))
      .orderBy($"event_type")
  }

  private val pinballLossSql =
    """WITH cuts AS (
      |  SELECT event_type, ROUND(quantile_cont(value, 0.9), 6) AS p90
      |  FROM events GROUP BY 1
      |), l AS (
      |  SELECT e.event_type, c.p90,
      |    CAST(e.value AS DECIMAL(25,6)) AS yd,
      |    CAST(c.p90 AS DECIMAL(25,6)) AS pd
      |  FROM events e JOIN cuts c ON e.event_type = c.event_type)
      |SELECT event_type, count(*) AS n, any_value(p90) AS p90,
      |  CAST(SUM(CASE WHEN yd > pd THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
      |  CAST(SUM(CASE WHEN yd >= pd
      |    THEN CAST(0.9 AS DECIMAL(2,1)) * (yd - pd)
      |    ELSE CAST(0.1 AS DECIMAL(2,1)) * (pd - yd) END) AS DOUBLE)
      |    / count(*) AS mean_pinball
      |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin

  // ----------------------------------------------- calibration bins
  /** Score-calibration reliability table: an integer rule score (the
    * evt_risk_flags family — value/hour/entity tests, all exact) binned
    * directly, with the empirical positive rate per bin — the
    * calibration curve without a libm sigmoid anywhere. Rates are one
    * double division of exact counts. */
  private def calibrationBins(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ev(spark, dir)
      .withColumn("score",
        when($"value" > 50.0, 1L).otherwise(0L) +
        when($"value" > 80.0, 1L).otherwise(0L) +
        when(expr("(ems div 3600000) % 24") < 6, 1L).otherwise(0L) +
        when($"user_id" % 3 === 0, 1L).otherwise(0L))
      .withColumn("y", when($"event_type" === "purchase", 1L).otherwise(0L))
      .groupBy($"score")
      .agg(count(lit(1)).as("n"), sum($"y").as("n_pos"),
        (sum($"y").cast("double") / count(lit(1))).as("pos_rate"))
      .orderBy($"score")
  }

  private val calibrationBinsSql =
    """WITH s AS (
      |  SELECT
      |    (CASE WHEN value > 50.0 THEN 1 ELSE 0 END
      |     + CASE WHEN value > 80.0 THEN 1 ELSE 0 END
      |     + CASE WHEN (epoch_ms(ts) // 3600000) % 24 < 6 THEN 1 ELSE 0 END
      |     + CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END) AS score,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events)
      |SELECT CAST(score AS BIGINT) AS score, count(*) AS n,
      |  CAST(SUM(y) AS BIGINT) AS n_pos,
      |  CAST(SUM(y) AS DOUBLE) / count(*) AS pos_rate
      |FROM s GROUP BY score ORDER BY score""".stripMargin

  // ------------------------------------- expected calibration error (ECE)
  /** Expected Calibration Error over the [[brierBins]] reliability table
    * (round 12 — the scalar summary next to ml_calibration_bins' raw
    * curve and the Brier Murphy decomposition:
    * ECE = Σ_b (n_b/N)·|acc_b − conf_b|, the metric model cards quote).
    * Determinism: each bin's term n_b·|acc−conf| is quantized to
    * micro-ints BEFORE summation (integer sums are order-independent; a
    * bare double Σ over bins would depend on bin visit order), and the
    * closing value is ONE exact-BIGINT-over-BIGINT division. Bins are
    * bounded (5 rule-score levels), the corpus-sized work is the one
    * groupBy — mergeable counts, which is what makes the streaming twin
    * a complete-mode aggregation. */
  private def eceEval(spark: SparkSession, dir: String): DataFrame =
    eceFromBins(brierBins(ev(spark, dir)))

  /** Shared ECE finale from the (score, n, pos) bins — the streaming
    * twin reads the same bins off its complete-mode sink. */
  private[graft] def eceFromBins(b: DataFrame): DataFrame = {
    val withC = b
      .withColumn("conf", col("score") / lit(4.0))
      .withColumn("acc", col("pos").cast("double") / col("n"))
      .withColumn("contrib_micro",
        floor(abs(col("acc") - col("conf")) * col("n") * lit(1000000.0))
          .cast("long"))
    val g = withC.agg(sum(col("n")).as("tn"),
      sum(col("contrib_micro")).as("cm"))
    withC.crossJoin(broadcast(g))
      .select(col("score"), col("n"), col("pos"), col("conf"), col("acc"),
        col("contrib_micro"),
        (col("cm").cast("double") / (col("tn") * lit(1000000L)).cast("double"))
          .as("ece"))
      .orderBy(col("score"))
  }

  private[graft] val eceSql =
    """WITH s AS (
      |  SELECT
      |    (CASE WHEN value > 50.0 THEN 1 ELSE 0 END
      |     + CASE WHEN value > 80.0 THEN 1 ELSE 0 END
      |     + CASE WHEN (epoch_ms(ts) // 3600000) % 24 < 6 THEN 1 ELSE 0 END
      |     + CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END) AS score,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events
      |), b AS (
      |  SELECT CAST(score AS BIGINT) AS score, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(y) AS BIGINT) AS pos
      |  FROM s GROUP BY score
      |), c AS (
      |  SELECT score, n, pos, score / 4.0 AS conf,
      |    CAST(pos AS DOUBLE) / n AS acc
      |  FROM b
      |), d AS (
      |  SELECT score, n, pos, conf, acc,
      |    CAST(FLOOR(ABS(acc - conf) * n * 1000000.0) AS BIGINT)
      |      AS contrib_micro
      |  FROM c
      |), g AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS tn,
      |    CAST(SUM(contrib_micro) AS BIGINT) AS cm
      |  FROM d
      |)
      |SELECT score, n, pos, conf, acc, contrib_micro,
      |  CAST(cm AS DOUBLE) / CAST(tn * 1000000 AS DOUBLE) AS ece
      |FROM d, g ORDER BY score""".stripMargin

  // ------------------------------------------- Brier score decomposition
  /** Murphy decomposition of the Brier score over the binned forecast
    * (the [[calibrationBins]] rule score mapped to probabilities
    * f = score/4): per bin, the reliability contribution
    * n·(f − o)²/N (calibration error), the resolution contribution
    * n·(o − ō)²/N (discrimination), and the shared uncertainty ō(1 − ō);
    * Brier = REL − RES + UNC is an exact identity when bins = distinct
    * forecast values, and the spec verifies it against an independently
    * computed mean (f − y)². All counts exact BIGINT; each contribution
    * is the same double formula in both engines (one division per term,
    * squares of identical doubles). Single-pass groupBy — the
    * forecast-verification report a scoring pipeline files next to its
    * calibration curve. */
  private def brierDecomposition(spark: SparkSession, dir: String): DataFrame =
    brierFromBins(brierBins(ev(spark, dir)))

  /** Per-score (n, pos) bins — shared with the streaming twin (where the
    * same expression aggregates in complete mode). */
  private[graft] def brierBins(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    e.withColumn("score",
        when(c("value") > 50.0, 1L).otherwise(0L) +
        when(c("value") > 80.0, 1L).otherwise(0L) +
        when(expr("(ems div 3600000) % 24") < 6, 1L).otherwise(0L) +
        when(c("user_id") % 3 === 0, 1L).otherwise(0L))
      .withColumn("y", when(c("event_type") === "purchase", 1L).otherwise(0L))
      .groupBy(c("score")).agg(count(lit(1)).as("n"), sum(c("y")).as("pos"))
  }

  /** Shared Murphy-decomposition finale from the (score, n, pos) bins. */
  private[graft] def brierFromBins(b: DataFrame): DataFrame = {
    val g = b.agg(sum(col("n")).as("tn"), sum(col("pos")).as("tp"))
    val f = col("score") / lit(4.0)
    val o = col("pos").cast("double") / col("n")
    val obar = col("tp").cast("double") / col("tn")
    b.crossJoin(broadcast(g))
      .select(col("score"), col("n"), col("pos"),
        f.as("forecast"), o.as("obs_rate"),
        (col("n") * (f - o) * (f - o) / col("tn")).as("reliability_c"),
        (col("n") * (o - obar) * (o - obar) / col("tn")).as("resolution_c"),
        (obar * (lit(1.0) - obar)).as("uncertainty"))
      .orderBy(col("score"))
  }

  private[graft] val brierDecompositionSql =
    """WITH s AS (
      |  SELECT
      |    (CASE WHEN value > 50.0 THEN 1 ELSE 0 END
      |     + CASE WHEN value > 80.0 THEN 1 ELSE 0 END
      |     + CASE WHEN (epoch_ms(ts) // 3600000) % 24 < 6 THEN 1 ELSE 0 END
      |     + CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END) AS score,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events
      |), b AS (
      |  SELECT CAST(score AS BIGINT) AS score, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(y) AS BIGINT) AS pos
      |  FROM s GROUP BY score
      |), g AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(pos) AS BIGINT) AS tp
      |  FROM b
      |)
      |SELECT b.score, b.n, b.pos,
      |  b.score / 4.0 AS forecast,
      |  CAST(b.pos AS DOUBLE) / b.n AS obs_rate,
      |  b.n * (b.score / 4.0 - CAST(b.pos AS DOUBLE) / b.n)
      |      * (b.score / 4.0 - CAST(b.pos AS DOUBLE) / b.n) / g.tn
      |    AS reliability_c,
      |  b.n * (CAST(b.pos AS DOUBLE) / b.n - CAST(g.tp AS DOUBLE) / g.tn)
      |      * (CAST(b.pos AS DOUBLE) / b.n - CAST(g.tp AS DOUBLE) / g.tn)
      |      / g.tn AS resolution_c,
      |  (CAST(g.tp AS DOUBLE) / g.tn) * (1.0 - CAST(g.tp AS DOUBLE) / g.tn)
      |    AS uncertainty
      |FROM b, g ORDER BY b.score""".stripMargin

  // ------------------------------------------------- Qini uplift curve
  /** Uplift-model evaluation (Qini curve by score level): a deterministic
    * treatment assignment (user_id % 2 — the synthetic A/B split, like
    * the A/B z-test query) against the purchase outcome, ranked by an
    * integer uplift score (the rule-score family, with the user term on
    * % 5 so score and treatment are not aliased). Per level: treated /
    * control counts and positives (exact BIGINT), the per-level uplift
    * (two divisions, one subtraction), and the cumulative Qini point
    * cpt − cpc·cnt/cnc — incremental treated positives over the
    * control expectation — walking the curve best-score-first. Positive
    * head + negative tail levels on this corpus, so the curve genuinely
    * discriminates. Single-pass groupBy + a |levels|-row window. */
  private def qiniUplift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = ev(spark, dir)
      .withColumn("score",
        when($"value" > 50.0, 1L).otherwise(0L) +
        when($"value" > 80.0, 1L).otherwise(0L) +
        when(expr("(ems div 3600000) % 24") < 6, 1L).otherwise(0L) +
        when($"user_id" % 5 === 0, 1L).otherwise(0L))
      .withColumn("t", when($"user_id" % 2 === 0, 1L).otherwise(0L))
      .withColumn("y", when($"event_type" === "purchase", 1L).otherwise(0L))
    val b = s.groupBy($"score").agg(
      sum($"t").as("nt"), sum(lit(1L) - $"t").as("nc"),
      sum($"t" * $"y").as("pt"), sum((lit(1L) - $"t") * $"y").as("pc"))
    val w = Window.orderBy($"score".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("cnt", sum($"nt").over(w))
      .withColumn("cnc", sum($"nc").over(w))
      .withColumn("cpt", sum($"pt").over(w))
      .withColumn("cpc", sum($"pc").over(w))
      .select($"score", $"nt", $"nc", $"pt", $"pc",
        // single-arm levels (nt or nc = 0) yield NULL in DuckDB but a
        // runtime DivideByZero under ANSI mode — guard both engines to
        // NULL identically (r11 advice; the graph_conductance discipline)
        when($"nt" > 0 && $"nc" > 0,
          $"pt".cast("double") / $"nt" - $"pc".cast("double") / $"nc")
          .as("uplift"),
        when($"cnc" > 0,
          $"cpt" - $"cpc".cast("double") * $"cnt" / $"cnc").as("qini"))
      .orderBy($"score".desc)
  }

  private val qiniUpliftSql =
    """WITH s AS (
      |  SELECT
      |    (CASE WHEN value > 50.0 THEN 1 ELSE 0 END
      |     + CASE WHEN value > 80.0 THEN 1 ELSE 0 END
      |     + CASE WHEN (epoch_ms(ts) // 3600000) % 24 < 6 THEN 1 ELSE 0 END
      |     + CASE WHEN user_id % 5 = 0 THEN 1 ELSE 0 END) AS score,
      |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events
      |), b AS (
      |  SELECT CAST(score AS BIGINT) AS score,
      |    CAST(SUM(t) AS BIGINT) AS nt, CAST(SUM(1 - t) AS BIGINT) AS nc,
      |    CAST(SUM(t * y) AS BIGINT) AS pt,
      |    CAST(SUM((1 - t) * y) AS BIGINT) AS pc
      |  FROM s GROUP BY score
      |), c AS (
      |  SELECT score, nt, nc, pt, pc,
      |    CAST(SUM(nt) OVER w AS BIGINT) AS cnt,
      |    CAST(SUM(nc) OVER w AS BIGINT) AS cnc,
      |    CAST(SUM(pt) OVER w AS BIGINT) AS cpt,
      |    CAST(SUM(pc) OVER w AS BIGINT) AS cpc
      |  FROM b WINDOW w AS (ORDER BY score DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)
      |SELECT score, nt, nc, pt, pc,
      |  CASE WHEN nt > 0 AND nc > 0
      |    THEN CAST(pt AS DOUBLE) / nt - CAST(pc AS DOUBLE) / nc END AS uplift,
      |  CASE WHEN cnc > 0
      |    THEN cpt - CAST(cpc AS DOUBLE) * cnt / cnc END AS qini
      |FROM c ORDER BY score DESC""".stripMargin

  // ----------------------------------------------- isotonic calibration
  /** ISOTONIC regression calibration (the standard monotone calibrator
    * next to [[calibrationBins]]'s raw reliability table) via the
    * CLOSED-FORM max–min characterization instead of the sequential PAVA
    * sweep: over B score bins,
    *   iso(i) = max_{j≤i} min_{k≥j} (pos[j..k] / n[j..k])
    * — mathematically identical to pool-adjacent-violators, but pure
    * relational algebra (prefix sums + a B×B interval join + two grouped
    * extrema), so both engines compute it without any data-dependent
    * iteration. Interval rates are ONE double division of exact BIGINT
    * prefix-sum differences; min/max of identical doubles are exact. The
    * deliberately noisy bin score (floor(value) % 10 — independent of the
    * purchase target) produces real pooling, not a vacuous pass-through.
    *
    * Scale: bins are bounded (10), so the interval join is 55 rows —
    * the corpus-sized work is one groupBy(score). */
  private def isotonicCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val b = ev(spark, dir)
      .withColumn("score", expr("cast(floor(value) as bigint) % 10"))
      .withColumn("y", when($"event_type" === "purchase", 1L).otherwise(0L))
      .groupBy($"score").agg(count(lit(1)).as("n"), sum($"y").as("pos"))
    val wS = Window.orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = b.withColumn("cn", sum($"n").over(wS))
      .withColumn("cp", sum($"pos").over(wS))
    val jSide = pre.select($"score".as("sj"),
      ($"cp" - $"pos").as("cp0"), ($"cn" - $"n").as("cn0"))
    val kSide = pre.select($"score".as("sk"), $"cp".as("cpk"), $"cn".as("cnk"))
    val iv = jSide.join(broadcast(kSide), $"sk" >= $"sj")
      .select($"sj",
        (($"cpk" - $"cp0").cast("double") / ($"cnk" - $"cn0")).as("avg_jk"))
    val mn = iv.groupBy($"sj").agg(min($"avg_jk").as("min_up"))
    val iso = b.select($"score").join(broadcast(mn), $"sj" <= $"score")
      .groupBy($"score").agg(max($"min_up").as("rate_iso"))
    b.join(iso, Seq("score"))
      .select($"score", $"n", $"pos".as("n_pos"),
        ($"pos".cast("double") / $"n").as("rate_raw"), $"rate_iso")
      .orderBy($"score")
  }

  private val isotonicCalibrationSql =
    """WITH s AS (
      |  SELECT CAST(FLOOR(value) AS BIGINT) % 10 AS score,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events
      |), b AS (
      |  SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(y) AS BIGINT) AS pos
      |  FROM s GROUP BY score
      |), pre AS (
      |  SELECT score, n, pos,
      |    CAST(SUM(n) OVER (ORDER BY score) AS BIGINT) AS cn,
      |    CAST(SUM(pos) OVER (ORDER BY score) AS BIGINT) AS cp
      |  FROM b
      |), iv AS (
      |  SELECT j.score AS sj,
      |    CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
      |      / (k.cn - (j.cn - j.n)) AS avg_jk
      |  FROM pre j JOIN pre k ON k.score >= j.score
      |), mn AS (
      |  SELECT sj, MIN(avg_jk) AS min_up FROM iv GROUP BY sj
      |), iso AS (
      |  SELECT b.score, MAX(m.min_up) AS rate_iso
      |  FROM b JOIN mn m ON m.sj <= b.score GROUP BY b.score
      |)
      |SELECT b.score, b.n, b.pos AS n_pos,
      |  CAST(b.pos AS DOUBLE) / b.n AS rate_raw, i.rate_iso
      |FROM b JOIN iso i USING (score) ORDER BY b.score""".stripMargin

  // --------------------------------------- Holt linear-trend forecast
  /** The Holt two-parameter (level, trend) recurrence was documented in
    * round 7 as UNREACHABLE under DuckDB's sequential struct evaluation
    * (the coupled (l,b) update is cyclic — no field order works, and the
    * first application is simultaneous; see [[seasonalForecast]]). This
    * query closes that gap with the other escape hatch noted there:
    * a FIXED-LENGTH series + per-step unrolled CTEs, one CTE per update.
    *
    * Series: per-type hourly counts on the 14-hour grid anchored at the
    * corpus max hour (absent hours = 0 — the anchor makes the length a
    * constant, which the unrolled oracle requires). α = β = ½ makes
    * every state a dyadic rational with denominator 4^(t−1), so the
    * whole recurrence is EXACT INTEGERS once scaled: with
    * L_t = l_t·4^(t−1), B_t = b_t·4^(t−1), p = 4^(t−2),
    *
    *   l_t = (x_t + l_{t−1} + b_{t−1})/2   ⇒  L_t = 2p·x_t + 2L + 2B
    *   b_t = (l_t − l_{t−1} + b_{t−1})/2   ⇒  B_t = p·x_t − L + 3B
    *
    * (B_t already expanded to old-state form — the CLAUDE.md recurrence
    * rule.) Init l₁ = x₁, b₁ = x₁ − x₀; 12 updates end at denominator
    * 4^12 = 2^24, and level/trend/forecasts are single double divisions
    * of exact integers by 16777216.0. |L| ≤ 3·x_max·2^24 keeps BIGINT
    * safe to ~5·10¹¹ events per type-hour.
    *
    * Scale shape: one shuffle on (type, hour) — the grid pivot and the
    * 12-step fold are per-type expression work inside codegen. */
  private def holtForecast(spark: SparkSession, dir: String): DataFrame =
    holtTail(ev(spark, dir)
      .withColumn("h", expr("ems div 3600000"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c")))

  /** The Holt finale over a per-(type, hour) count table `(event_type, h,
    * c)` — shared by the batch query and the streaming monitor (whose
    * complete-mode aggregation state IS that table), so both runtimes
    * share the unrolled oracle. */
  private[graft] def holtTail(pm: DataFrame): DataFrame = {
    val spark = pm.sparkSession
    import spark.implicits._
    val mx = pm.agg(max($"h").as("mxh"))
    val xcols = (0 to 13).map(i =>
      sum(when($"t" === i, $"c").otherwise(0L)).cast("long").as(s"x$i"))
    val xs = pm.crossJoin(broadcast(mx))
      .withColumn("t", $"h" - ($"mxh" - 13))
      .filter($"t" >= 0)
      .groupBy($"event_type")
      .agg(xcols.head, xcols.tail: _*)
    // fold through chained selects with NAMED l/b attributes per step —
    // the same discipline as holtWintersTail: nesting the recurrence as
    // raw Column expressions doubles the tree per step (~2^12 nodes by
    // step 12), while per-step projections keep it linear (CollapseProject
    // leaves them alone because l/b are multi-referenced non-cheap aliases)
    var df = xs.select(
      Seq($"event_type") ++ (2 to 13).map(i => col(s"x$i")) ++ Seq(
        $"x1".as("l"), ($"x1" - $"x0").as("b")): _*)
    var p = 1L
    for (t <- 2 to 13) {
      df = df.select(
        Seq($"event_type") ++ ((t + 1) to 13).map(i => col(s"x$i")) ++ Seq(
          (col(s"x$t") * lit(2 * p) + lit(2L) * $"l" + lit(2L) * $"b")
            .as("l"),
          (col(s"x$t") * lit(p) - $"l" + lit(3L) * $"b").as("b")): _*)
      p *= 4
    }
    df.select($"event_type", $"l".as("l_scaled"), $"b".as("b_scaled"))
      .select($"event_type", $"l_scaled", $"b_scaled",
        ($"l_scaled".cast("double") / lit(16777216.0)).as("level"),
        ($"b_scaled".cast("double") / lit(16777216.0)).as("trend"),
        (($"l_scaled" + $"b_scaled").cast("double") / lit(16777216.0))
          .as("forecast_1"),
        (($"l_scaled" + lit(2L) * $"b_scaled").cast("double")
          / lit(16777216.0)).as("forecast_2"),
        (($"l_scaled" + lit(3L) * $"b_scaled").cast("double")
          / lit(16777216.0)).as("forecast_3"))
      .orderBy($"event_type")
  }

  private[graft] val holtForecastSql = {
    val xcols = (0 to 13).map(i =>
      s"""CAST(COALESCE(SUM(CASE WHEN t = $i THEN c END), 0) AS BIGINT)
         |    AS x$i""".stripMargin).mkString(",\n  ")
    val steps = (2 to 13).map { t =>
      val p = math.pow(4, t - 2).toLong
      val rest = ((t + 1) to 13).map(i => s"x$i")
      val keep = if (rest.isEmpty) "" else rest.mkString(", ") + ", "
      s"""s$t AS (SELECT event_type, $keep
         |  x$t * ${2 * p} + 2 * l${t - 1} + 2 * b${t - 1} AS l$t,
         |  x$t * $p - l${t - 1} + 3 * b${t - 1} AS b$t FROM s${t - 1})"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH pm AS (
       |  SELECT event_type, epoch_ms(ts) // 3600000 AS h,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2
       |), m AS (SELECT MAX(h) AS mxh FROM pm),
       |xs AS (
       |  SELECT event_type,
       |  $xcols
       |  FROM (SELECT event_type, h - (mxh - 13) AS t, c FROM pm, m
       |        WHERE h >= mxh - 13)
       |  GROUP BY event_type
       |),
       |s1 AS (SELECT event_type, ${(2 to 13).map(i => s"x$i").mkString(", ")},
       |  x1 AS l1, x1 - x0 AS b1 FROM xs),
       |$steps
       |SELECT event_type, l13 AS l_scaled, b13 AS b_scaled,
       |  CAST(l13 AS DOUBLE) / 16777216.0 AS level,
       |  CAST(b13 AS DOUBLE) / 16777216.0 AS trend,
       |  CAST(l13 + b13 AS DOUBLE) / 16777216.0 AS forecast_1,
       |  CAST(l13 + 2 * b13 AS DOUBLE) / 16777216.0 AS forecast_2,
       |  CAST(l13 + 3 * b13 AS DOUBLE) / 16777216.0 AS forecast_3
       |FROM s13 ORDER BY event_type""".stripMargin
  }

  // ------------------------------------- rolling-origin forecast backtest
  /** Rolling-origin backtest of the Brown forecaster — the evaluation
    * harness a forecasting feature needs before anyone trusts it: for
    * each of the last 4 hours as an anchor, fit Brown double smoothing
    * on the per-type hourly series UP TO the anchor (no leakage), emit
    * the 1-step forecast next to the hour that actually happened. The
    * fold is [[brown]]'s exact acyclic double cascade (0.25/0.75 written
    * identically in both engines); the error is one subtract + abs.
    * Anchor fan-out is 4×, the grid is calendar-bounded, one shuffle on
    * (type, anchor). */
  private def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pm = ev(spark, dir)
      .withColumn("h", expr("ems div 3600000"))
      .groupBy($"event_type", $"h").agg(count(lit(1)).as("c"))
    val b = pm.agg(min($"h").as("mn"), max($"h").as("mx"))
    val grid = b.select(explode(sequence($"mn", $"mx")).as("h"))
    val x = pm.select($"event_type".as("event_type")).distinct()
      .crossJoin(broadcast(grid))
      .join(pm, Seq("event_type", "h"), "left")
      .select($"event_type", $"h", coalesce($"c", lit(0L)).as("x"))
    val anchors = b.select(explode(sequence($"mx" - 4L, $"mx" - 1L))
      .as("anchor"))
    val fits = x.crossJoin(broadcast(anchors))
      .filter($"h" <= $"anchor")
      .groupBy($"event_type", $"anchor")
      .agg(expr("transform(array_sort(collect_list(struct(h, x)))," +
        " p -> cast(p.x as double))").as("vs"))
      .select($"event_type", $"anchor",
        size($"vs").cast("long").as("n_points"),
        expr("""aggregate(slice(vs, 2, size(vs) - 1),
          named_struct('s2', vs[0], 's1', vs[0]),
          (acc, x) -> named_struct(
            's2', 0.0625D * x + 0.1875D * acc.s1 + 0.75D * acc.s2,
            's1', 0.25D * x + 0.75D * acc.s1))""").as("f"))
      .select($"event_type", $"anchor", $"n_points",
        ((lit(2.0) * $"f".getField("s1") - $"f".getField("s2")) +
          ($"f".getField("s1") - $"f".getField("s2")) / lit(3.0))
          .as("forecast_1"))
    val actual = x.select($"event_type", ($"h" - 1L).as("anchor"),
      $"x".as("actual"))
    fits.join(actual, Seq("event_type", "anchor"))
      .select($"event_type", $"anchor", $"n_points", $"forecast_1",
        $"actual", abs($"forecast_1" - $"actual".cast("double"))
          .as("abs_err"))
      .orderBy($"event_type", $"anchor")
  }

  private val forecastBacktestSql =
    """WITH pm AS (
      |  SELECT event_type, epoch_ms(ts) // 3600000 AS h,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2
      |), b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM pm),
      |grid AS (SELECT unnest(generate_series(mn, mx)) AS h FROM b),
      |ty AS (SELECT DISTINCT event_type FROM pm),
      |x AS (
      |  SELECT ty.event_type, grid.h, COALESCE(pm.c, 0) AS x
      |  FROM ty CROSS JOIN grid
      |  LEFT JOIN pm ON pm.event_type = ty.event_type AND pm.h = grid.h
      |), anchors AS (
      |  SELECT unnest(generate_series(mx - 4, mx - 1)) AS anchor FROM b
      |), s AS (
      |  SELECT event_type, anchor,
      |    list(CAST(x AS DOUBLE) ORDER BY h) AS vs
      |  FROM x, anchors WHERE h <= anchor
      |  GROUP BY event_type, anchor
      |), f AS (
      |  SELECT event_type, anchor, CAST(len(vs) AS BIGINT) AS n_points,
      |    list_reduce(
      |      list_prepend({'s2': vs[1], 's1': vs[1]},
      |        list_transform(vs[2:], e -> {'s2': e, 's1': e})),
      |      (acc, x) -> {
      |        's2': 0.0625 * x.s1 + 0.1875 * acc.s1 + 0.75 * acc.s2,
      |        's1': 0.25 * x.s1 + 0.75 * acc.s1}) AS f
      |  FROM s
      |)
      |SELECT f.event_type, CAST(f.anchor AS BIGINT) AS anchor, f.n_points,
      |  (2.0 * f.f.s1 - f.f.s2) + (f.f.s1 - f.f.s2) / 3.0 AS forecast_1,
      |  x.x AS actual,
      |  ABS((2.0 * f.f.s1 - f.f.s2) + (f.f.s1 - f.f.s2) / 3.0
      |      - CAST(x.x AS DOUBLE)) AS abs_err
      |FROM f JOIN x ON x.event_type = f.event_type AND x.h = f.anchor + 1
      |ORDER BY f.event_type, anchor""".stripMargin

  // ------------------------------- Holt-Winters (level+trend+season)
  /** FULL additive Holt-Winters — the triple (l, b, s) recurrence that
    * round 7 documented as strictly unreachable under DuckDB's
    * list_reduce (the (l,b) coupling is cyclic AND the seasonal array
    * mutates one slot per step; see [[seasonalForecast]]'s doc). Same
    * escape hatch as [[holtForecast]], one size up: a 36-hour grid
    * anchored at the corpus max hour (24 h of seasonal init + 12
    * updates), α = β = γ = ½, and EVERY state integer-scaled by 4^τ —
    * the 24 seasonal slots ride along, untouched slots multiplying by 4
    * each step so the whole state vector shares one denominator.
    *
    * Old-state-form recurrences (step τ reads hour t = 23+τ, whose
    * seasonal slot is t mod 24 = τ−1; p = 4^(τ−1)):
    *
    *   L' = 2p·x − 2S[τ−1] + 2L + 2B
    *   B' =  p·x −  S[τ−1] −  L + 3B
    *   S'[τ−1] = p·x + 3S[τ−1] − L − B ;  S'[j≠τ−1] = 4S[j]
    *
    * Init: L = x₂₃, B = 0, S[j] = x_j − x₂₃. After 12 steps the shared
    * denominator is 4¹² = 2²⁴; level/trend/forecasts (ŷ_h = l + h·b +
    * s[(35+h) mod 24]) are single double divisions by 16777216.0.
    *
    * The Spark side folds through 13 chained SELECTs (init + 12 steps)
    * so every reference is a named attribute, not an exponentially
    * expanded tree; the oracle mirrors with 13 chained CTEs. One
    * shuffle on (type, hour); everything after is per-type expression
    * work. */
  private def holtWinters(spark: SparkSession, dir: String): DataFrame =
    holtWintersTail(ev(spark, dir)
      .withColumn("h", expr("ems div 3600000"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c")))

  /** Holt-Winters finale over a per-(type, hour) count table (same
    * contract as [[holtTail]]); shared with the streaming monitor. */
  private[graft] def holtWintersTail(pm: DataFrame): DataFrame = {
    val spark = pm.sparkSession
    import spark.implicits._
    val mx = pm.agg(max($"h").as("mxh"))
    val xcols = (0 to 35).map(i =>
      sum(when($"t" === i, $"c").otherwise(0L)).cast("long").as(s"x$i"))
    val xs = pm.crossJoin(broadcast(mx))
      .withColumn("t", $"h" - ($"mxh" - 35))
      .filter($"t" >= 0)
      .groupBy($"event_type")
      .agg(xcols.head, xcols.tail: _*)
    // init projection: consume x0..x23 into the seasonal slots
    var df = xs.select(
      Seq($"event_type") ++ (24 to 35).map(i => col(s"x$i")) ++ Seq(
        $"x23".as("l"), lit(0L).as("b")) ++
        (0 to 23).map(j => (col(s"x$j") - $"x23").as(s"s_$j")): _*)
    var p = 1L
    for (tau <- 1 to 12) {
      val t = 23 + tau
      val slot = tau - 1
      val x = col(s"x$t")
      df = df.select(
        Seq($"event_type") ++ ((t + 1) to 35).map(i => col(s"x$i")) ++ Seq(
          (x * lit(2 * p) - lit(2L) * col(s"s_$slot") + lit(2L) * $"l" +
            lit(2L) * $"b").as("l"),
          (x * lit(p) - col(s"s_$slot") - $"l" + lit(3L) * $"b").as("b")) ++
          (0 to 23).map { j =>
            if (j == slot)
              (x * lit(p) + lit(3L) * col(s"s_$j") - $"l" - $"b").as(s"s_$j")
            else (col(s"s_$j") * lit(4L)).as(s"s_$j")
          }: _*)
      p *= 4
    }
    df.select($"event_type", $"l".as("l_scaled"), $"b".as("b_scaled"),
        ($"l".cast("double") / lit(16777216.0)).as("level"),
        ($"b".cast("double") / lit(16777216.0)).as("trend"),
        ($"s_12".cast("double") / lit(16777216.0)).as("season_next"),
        (($"l" + $"b" + $"s_12").cast("double") / lit(16777216.0))
          .as("forecast_1"),
        (($"l" + lit(2L) * $"b" + $"s_13").cast("double") / lit(16777216.0))
          .as("forecast_2"))
      .orderBy($"event_type")
  }

  private[graft] val holtWintersSql = {
    val xcols = (0 to 35).map(i =>
      s"""CAST(COALESCE(SUM(CASE WHEN t = $i THEN c END), 0) AS BIGINT)
         |    AS x$i""".stripMargin).mkString(",\n  ")
    val initS = (0 to 23).map(j => s"x$j - x23 AS s0_$j").mkString(", ")
    val steps = (1 to 12).map { tau =>
      val t = 23 + tau
      val slot = tau - 1
      val p = math.pow(4, tau - 1).toLong
      val keepX = ((t + 1) to 35).map(i => s"x$i")
      val keep = if (keepX.isEmpty) "" else keepX.mkString(", ") + ","
      val prev = tau - 1
      val slots = (0 to 23).map { j =>
        if (j == slot)
          s"x$t * $p + 3 * s${prev}_$j - l$prev - b$prev AS s${tau}_$j"
        else s"4 * s${prev}_$j AS s${tau}_$j"
      }.mkString(",\n  ")
      s"""hw$tau AS (SELECT event_type, $keep
         |  x$t * ${2 * p} - 2 * s${prev}_$slot + 2 * l$prev + 2 * b$prev
         |    AS l$tau,
         |  x$t * $p - s${prev}_$slot - l$prev + 3 * b$prev AS b$tau,
         |  $slots
         |  FROM hw$prev)""".stripMargin
    }.mkString(",\n")
    s"""WITH pm AS (
       |  SELECT event_type, epoch_ms(ts) // 3600000 AS h,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2
       |), m AS (SELECT MAX(h) AS mxh FROM pm),
       |xs AS (
       |  SELECT event_type,
       |  $xcols
       |  FROM (SELECT event_type, h - (mxh - 35) AS t, c FROM pm, m
       |        WHERE h >= mxh - 35)
       |  GROUP BY event_type
       |),
       |hw0 AS (SELECT event_type,
       |  ${(24 to 35).map(i => s"x$i").mkString(", ")},
       |  x23 AS l0, CAST(0 AS BIGINT) AS b0, $initS FROM xs),
       |$steps
       |SELECT event_type, l12 AS l_scaled, b12 AS b_scaled,
       |  CAST(l12 AS DOUBLE) / 16777216.0 AS level,
       |  CAST(b12 AS DOUBLE) / 16777216.0 AS trend,
       |  CAST(s12_12 AS DOUBLE) / 16777216.0 AS season_next,
       |  CAST(l12 + b12 + s12_12 AS DOUBLE) / 16777216.0 AS forecast_1,
       |  CAST(l12 + 2 * b12 + s12_13 AS DOUBLE) / 16777216.0 AS forecast_2
       |FROM hw12 ORDER BY event_type""".stripMargin
  }

  // --------------------------------------- Mann-Kendall trend test
  /** Exact Mann-Kendall monotonic-trend test per event type over the
    * gap-filled GLOBAL hourly grid: S = Σ_{i<j} sgn(x_j − x_i) and the
    * tie-corrected variance numerator
    * var18 = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5) are exact BIGINTs;
    * z = S / √(var18/18) is the one shared double expression. The pair
    * join is bounded by calendar hours² per type (8760² ≈ 38M pairs for
    * a full year — a fixed, data-size-independent cost), never by event
    * count: events reduce to the hourly series first. */
  private def mannKendall(spark: SparkSession, dir: String): DataFrame =
    mannKendallTail(ev(spark, dir)
      .withColumn("h", expr("ems div 3600000"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c")))

  /** The Mann-Kendall finale over a per-(type, hour) count table — shared
    * by the batch query and the streaming monitor (same contract as
    * [[holtTail]]). */
  private[graft] def mannKendallTail(pm: DataFrame): DataFrame = {
    val spark = pm.sparkSession
    import spark.implicits._
    val b = pm.agg(min($"h").as("mn"), max($"h").as("mx"))
    val grid = b.select(explode(sequence($"mn", $"mx")).as("h"))
    // .as("event_type") mints a fresh attribute id — joining the distinct
    // type list back against pm would otherwise carry CONFLICTING refs
    // when pm is a memory-sink view (the streaming twin's input)
    val x = pm.select($"event_type".as("event_type")).distinct()
      .crossJoin(broadcast(grid))
      .join(pm, Seq("event_type", "h"), "left")
      .select($"event_type", $"h", coalesce($"c", lit(0L)).as("x"))
    val s = x.as("a")
      .join(x.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.h") < col("b.h"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(sum(when(col("b.x") > col("a.x"), 1L)
        .when(col("b.x") < col("a.x"), -1L).otherwise(0L)).as("s_stat"))
    val ties = x.groupBy($"event_type", $"x")
      .agg(count(lit(1)).as("tg"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_distinct"),
        sum($"tg" * ($"tg" - 1L) * (lit(2L) * $"tg" + 5L)).as("tie_term"))
    val n = x.groupBy($"event_type").agg(count(lit(1)).as("n"))
    n.join(s, Seq("event_type")).join(ties, Seq("event_type"))
      .withColumn("var18",
        $"n" * ($"n" - 1L) * (lit(2L) * $"n" + 5L) - $"tie_term")
      .select($"event_type", $"n", $"s_stat", $"n_distinct", $"var18",
        when($"var18" > 0L,
          $"s_stat".cast("double") /
            sqrt($"var18".cast("double") / lit(18.0)))
          .otherwise(lit(0.0)).as("z"))
      .orderBy($"event_type")
  }

  private[graft] val mannKendallSql =
    """WITH pm AS (
      |  SELECT event_type, epoch_ms(ts) // 3600000 AS h,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2
      |), b AS (SELECT MIN(h) AS mn, MAX(h) AS mx FROM pm),
      |grid AS (SELECT unnest(generate_series(mn, mx)) AS h FROM b),
      |ty AS (SELECT DISTINCT event_type FROM pm),
      |x AS (
      |  SELECT ty.event_type, grid.h, COALESCE(pm.c, 0) AS x
      |  FROM ty CROSS JOIN grid
      |  LEFT JOIN pm ON pm.event_type = ty.event_type AND pm.h = grid.h
      |), s AS (
      |  SELECT a.event_type,
      |    CAST(SUM(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1
      |      ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM x a JOIN x b ON a.event_type = b.event_type AND a.h < b.h
      |  GROUP BY a.event_type
      |), ties AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |    CAST(SUM(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT) AS tie_term
      |  FROM (SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS tg
      |        FROM x GROUP BY event_type, x)
      |  GROUP BY event_type
      |), n AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM x
      |  GROUP BY event_type
      |)
      |SELECT n.event_type, n.n, s.s_stat, ties.n_distinct,
      |  CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term AS BIGINT)
      |    AS var18,
      |  CASE WHEN n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term > 0 THEN
      |    CAST(s.s_stat AS DOUBLE)
      |      / SQRT(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term
      |          AS DOUBLE) / 18.0)
      |  ELSE 0.0 END AS z
      |FROM n JOIN s USING (event_type) JOIN ties USING (event_type)
      |ORDER BY n.event_type""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_holt_forecast" -> (holtForecast _),
    "evt_holt_winters" -> (holtWinters _),
    "evt_forecast_backtest" -> (forecastBacktest _),
    "evt_mann_kendall" -> (mannKendall _),
    "graph_link_prediction" -> (linkPrediction _),
    "ml_pinball_loss" -> (pinballLoss _),
    "ml_calibration_bins" -> (calibrationBins _),
    "ml_isotonic_calibration" -> (isotonicCalibration _),
    "ml_brier_decomposition" -> (brierDecomposition _),
    "ml_ece" -> (eceEval _),
    "ml_qini_uplift" -> (qiniUplift _),
    "dq_k_anonymity" -> (kAnonymity _),
    "dq_l_diversity" -> (lDiversity _),
    "evt_seasonal_forecast" -> (seasonalForecast _),
    "evt_time_to_convert" -> (timeToConvert _),
    "quality_winsorize" -> (winsorize _),
    "evt_brown_forecast" -> (brown _),
    "ml_ab_test" -> (abTest _),
    "ml_feature_auc" -> (featureAuc _),
    "ml_learning_curve" -> (learningCurve _),
    "rel_item_similarity" -> (itemSimilarity _),
    "dedup_containment" -> (containment _),
    "graph_kcore" -> (kcore _))

  override def oracles: Map[String, String] = Map(
    "evt_holt_forecast" -> holtForecastSql,
    "evt_holt_winters" -> holtWintersSql,
    "evt_forecast_backtest" -> forecastBacktestSql,
    "evt_mann_kendall" -> mannKendallSql,
    "graph_link_prediction" -> linkPredictionSql,
    "ml_pinball_loss" -> pinballLossSql,
    "ml_calibration_bins" -> calibrationBinsSql,
    "ml_isotonic_calibration" -> isotonicCalibrationSql,
    "ml_brier_decomposition" -> brierDecompositionSql,
    "ml_ece" -> eceSql,
    "ml_qini_uplift" -> qiniUpliftSql,
    "dq_k_anonymity" -> kAnonymitySql,
    "dq_l_diversity" -> lDiversitySql,
    "evt_seasonal_forecast" -> seasonalForecastSql,
    "evt_time_to_convert" -> timeToConvertSql,
    "quality_winsorize" -> winsorizeSql,
    "evt_brown_forecast" -> brownSql,
    "ml_ab_test" -> abTestSql,
    "ml_feature_auc" -> featureAucSql,
    "ml_learning_curve" -> learningCurveSql,
    "rel_item_similarity" -> itemSimilaritySql,
    "dedup_containment" -> containmentSql,
    "graph_kcore" -> kcoreSql)
}
