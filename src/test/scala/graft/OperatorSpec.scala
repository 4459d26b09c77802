package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** Ports of the reference's canonical unit fixtures (FIXTURES.md §1/§2,
  * ref streaming/simple/test_stream_processor.py) onto the batch operators,
  * plus AsOfJoin edge cases. */
class OperatorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // Canonical 3-event fixture (test_stream_processor.py:78-127): same card,
  // +1s/+2s/+3s, amounts 50/150/25, countries US/CA/US.
  private val txnFixture = Seq(
    ("card_1", 1000L, 50.0, "5411", "US"),
    ("card_1", 2000L, 150.0, "6011", "CA"),
    ("card_1", 3000L, 25.0, "5812", "US")
  ).toDF("card_id", "ems", "amount", "mcc", "geo_country")

  test("txn fixture: count/unique-countries/high-risk ratio in 5m window") {
    val agg = txnFixture.groupBy($"card_id").agg(
      count(lit(1)).as("txn_count_5m"),
      size(collect_set($"geo_country")).as("unique_countries_5m"),
      (sum(when($"mcc".isin("6011", "5967", "7011", "7995"), 1).otherwise(0)) /
        count(lit(1))).as("high_risk_txn_ratio"))
      .head()
    assert(agg.getAs[Long]("txn_count_5m") == 3L)
    assert(agg.getAs[Int]("unique_countries_5m") == 2)
    assert(agg.getAs[Double]("high_risk_txn_ratio") > 0.0)
  }

  // Canonical 4-event session funnel (test_stream_processor.py:145-214):
  // HOME/VIEW -> CATEGORY/CLICK -> PRODUCT/ADD_TO_CART -> CART/PURCHASE.
  private val clickFixture = Seq(
    ("user_1", "s1", 1000L, "HOME", "VIEW", None: Option[String]),
    ("user_1", "s1", 2000L, "CATEGORY", "CLICK", Some("electronics")),
    ("user_1", "s1", 3000L, "PRODUCT", "ADD_TO_CART", Some("electronics")),
    ("user_1", "s1", 4000L, "CART", "PURCHASE", Some("electronics"))
  ).toDF("user_id", "session_id", "ems", "page_type", "action_type", "category_id")

  test("click fixture: session funnel counters and conversion") {
    val agg = clickFixture.groupBy($"user_id", $"session_id").agg(
      count(lit(1)).as("pages_per_session"),
      size(collect_set($"category_id")).as("unique_categories_session"),
      sum(when($"action_type" === "ADD_TO_CART", 1).otherwise(0)).as("cart_adds"),
      sum(when($"action_type" === "PURCHASE", 1).otherwise(0)).as("purchases"))
      .withColumn("conversion_rate_session",
        $"purchases" / greatest($"cart_adds", lit(1L)))
      .head()
    assert(agg.getAs[Long]("pages_per_session") == 4L)
    assert(agg.getAs[Int]("unique_categories_session") == 1)
    assert(agg.getAs[Long]("cart_adds") == 1L)
    assert(agg.getAs[Long]("purchases") == 1L)
    assert(agg.getAs[Double]("conversion_rate_session") == 1.0)
  }

  test("asOfJoin: latest right at-or-before left ts; null when none") {
    val left = Seq(
      (1L, "u1", 100L), // before any right row -> null
      (2L, "u1", 200L), // exactly at right ts 200 -> visible (<=)
      (3L, "u1", 350L), // between 300 and future -> 300
      (4L, "u2", 500L)  // key with no right rows at all -> null
    ).toDF("qid", "user", "qts")
    val right = Seq(
      ("u1", 200L, 20.0),
      ("u1", 300L, 30.0),
      ("u1", 300L, 31.0), // tie at 300: greater tieBreak (rv) wins
      ("u1", 400L, 40.0)
    ).toDF("user", "rts", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("user"), "qts", "rts",
      rightCols = Seq("rts", "rv"), tieBreak = "rv")
      .orderBy($"qid").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("rv")))
    assert(out(1).getAs[Double]("rv") == 20.0)
    assert(out(2).getAs[Double]("rv") == 31.0)
    assert(out(3).isNullAt(out(3).fieldIndex("rv")))
  }

  test("asOfJoin result timestamps never exceed query timestamps (PIT invariant)") {
    val left = Seq((1L, "u1", 250L), (2L, "u1", 450L)).toDF("qid", "user", "qts")
    val right = Seq(("u1", 200L, 1.0), ("u1", 300L, 2.0), ("u1", 400L, 3.0))
      .toDF("user", "rts", "rv")
    val bad = AsOfJoin.asOf(left, right, Seq("user"), "qts", "rts",
      Seq("rts", "rv"), "rts")
      .filter($"rts" > $"qts").count()
    assert(bad == 0L)
  }

  test("connected components: chains, cliques, isolates-in-edges, determinism") {
    import graft.operators.ConnectedComponents
    // two components: a 4-chain (1-2-3-4) and a triangle (10,11,12),
    // plus a self-contained pair (20-21)
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (21L, 20L)).toDF("src", "dst")
    val comp = ConnectedComponents.components(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    // a long chain exercises multi-round propagation (diameter 9)
    val chain = (1L to 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val chainComp = ConnectedComponents.components(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chainComp.size == 10 && chainComp.values.forall(_ == 1L))
    // empty edge set -> empty result, no hang
    val none = ConnectedComponents.components(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(none.count() == 0L)
  }

  test("text_repetition: top-2gram tie-break, dup-3gram chars, short-doc drop") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rep").toString
    // doc 1: "a b" and "b c" both occur twice -> tie -> smallest gram;
    //   3-gram "a b c" occurs twice -> dup3_chars = 2 * 3 = 6, nosp = 8
    // doc 2: every 2-gram unique except tie at count 1 -> lexicographic min
    // doc 3: single token -> no 2-gram -> dropped
    Seq(
      (1L, "a b c a b c d e", "en", "synth", 15L),
      (2L, "z y x", "en", "synth", 5L),
      (3L, "solo", "en", "synth", 4L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextAnalysis.queries("text_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == "a b" && out(1L)._2 == 2L)
    assert(out(1L)._4 == 6.0 / 8.0) // two "a b c" occurrences, 3 chars each
    assert(out(2L)._1 == "y x" && out(2L)._2 == 1L) // tie -> smallest gram
    assert(out(2L)._4 == 0.0)
  }

  test("text_lm_score: hand-computed bit-length bigram surrogate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    // bigram stream: (x,x),(x,y) | (x,z); left-context count x=3 (bitlen 2),
    // every bigram count 1 (bitlen 1) -> lp = -1 per occurrence;
    // doc 2 has one token -> zero bigrams, score 0, keep (0 > -5)
    Seq(
      (0L, "x x y", "en", "spec", 5L),
      (1L, "x z", "en", "spec", 3L),
      (2L, "q", "en", "spec", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_lm_score")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (0L, 2L, -2L, -1.0, true),
      (1L, 1L, -1L, -1.0, true),
      (2L, 0L, 0L, 0.0, true)))
  }

  test("text_rank_keywords: fixed-point trajectory matches scalar reference") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tr").toString
    // graph from "a b a c": a-b weight 2 (both adjacencies), a-c weight 1;
    // out-weights a=3, b=2, c=1 -> asymmetric convergence, a ranks first
    Seq((0L, "a b a c", "en", "spec", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("text_rank_keywords")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // independent scalar replay of the same fixed-point recurrence
    val edges = Map(("a", "b") -> 2L, ("b", "a") -> 2L,
      ("a", "c") -> 1L, ("c", "a") -> 1L)
    val ow = Map("a" -> 3L, "b" -> 2L, "c" -> 1L)
    var sc = Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L)
    for (_ <- 1 to 5) {
      sc = sc.keys.map { v =>
        val inflow = edges.collect {
          case ((u, d), wt) if d == v => (sc(u) * wt) / ow(u)
        }.sum
        v -> (150000L + (850000L * inflow) / 1000000L)
      }.toMap
    }
    val expect = sc.toSeq.sortBy { case (k, s) => (-s, k) }.zipWithIndex
      .map { case ((k, s), i) => ((i + 1).toLong, k, s) }
    assert(got.toSeq == expect)
    assert(got.head._2 == "a") // the hub word wins
  }

  test("dedup_prefix_join finds EVERY pair at the threshold (no false negatives)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ppj").toString
    val texts = Seq(
      "a b c d e f", "a b c d e f g", "a b c d e f", // near/exact dups
      "x y z w q r", "x y z w q t",                  // partial overlap
      "p q r s t u v")                               // distinct
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "spec", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("dedup_prefix_join")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    // independent brute force over ALL pairs
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val sets = texts.map(shingles)
    val expect = (for {
      a <- sets.indices; b <- sets.indices if a < b
      inter = (sets(a) & sets(b)).size
      un = (sets(a) | sets(b)).size
      j = inter.toDouble / un if j >= 0.6
    } yield ((a.toLong, b.toLong), j)).toMap
    assert(got == expect)
    assert(expect.nonEmpty && expect.values.exists(_ < 1.0))
  }

  test("rel_skyline equals the brute-force NOT-EXISTS dominance filter") {
    val sf = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("rel_skyline")(spark, sf)
      .collect().map(r => (r.getAs[Long]("p_partkey"),
        r.getAs[Long]("p_size"), r.getAs[Double]("p_retailprice"))).toSet
    // quadratic definition, independent of the two-phase plan
    val pts = graft.core.Tables.part(spark, sf)
      .selectExpr("p_partkey", "cast(p_size as long) p_size", "p_retailprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx <= x && qy <= y && (qx < x || qy < y) }
    }.toSet
    assert(got == expect && got.nonEmpty)
  }

  test("rel_band_join equals the naive theta join (explode covers the band)") {
    // quadratic definition, independent of the bucket-explode plan: the
    // {b-1,b,b+1} fan-out must find EVERY pair within the band and each
    // pair exactly once (an off-by-one bucket or a double-count both
    // surface here); band = $100 since round 8 (the $1 band was empty at
    // sf0.001, caught by the EntrySpec rows>0 smoke)
    val sf = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("rel_band_join")(spark, sf)
      .collect().map(r => (r.getAs[Long]("ym"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("cents_gap_sum"))).toSet
    val o = graft.core.Tables.orders(spark, sf).selectExpr("o_orderkey okey",
      "cast(floor(o_totalprice * 100.0 + 0.5) as long) cents",
      "cast(year(o_orderdate) * 100 + month(o_orderdate) as long) ym")
    o.createOrReplaceTempView("bj_o")
    val expect = spark.sql(
      """SELECT a.ym, count(*) n_pairs, sum(abs(a.cents - b.cents)) gap
        |FROM bj_o a JOIN bj_o b ON a.ym = b.ym AND a.okey < b.okey
        |  AND abs(a.cents - b.cents) <= 10000
        |GROUP BY a.ym""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("dynamic-gap session boundary: adjacent-at-exactly-gap DOES merge") {
    // pins the oracle's merge predicate (new session iff ts > prev max
    // end — Spark merges TOUCHING windows, caught by this very spec):
    // two views exactly 10 min apart at µs precision share a session;
    // one µs further apart splits
    import spark.implicits._
    val base = 1704067200000000L // µs
    val gapUs = 600000000L // 10 min (non-click gap)
    def run(deltaUs: Long): Long = {
      val df = Seq(
        (7L, base, "view", 1.0),
        (7L, base + deltaUs, "view", 1.0)
      ).toDF("user_id", "us", "event_type", "value")
        .select($"user_id", $"event_type", $"value",
          expr("timestamp_micros(us)").as("ts"))
      df.groupBy(org.apache.spark.sql.functions.session_window($"ts",
          graft.queries.FeatureOps.dynamicGapCol), $"user_id")
        .count().count()
    }
    assert(run(gapUs) == 1L,      "exactly-gap-apart (touching) must merge")
    assert(run(gapUs + 1L) == 2L, "one microsecond further must split")
  }

  test("emb_hard_negatives: never the query label, cosine-descending ranks") {
    val out = SparkEntry.queries("emb_hard_negatives")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 25)
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 5)
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
      assert(rows.forall(r =>
        r.getAs[Int]("negative_label") != r.getAs[Int]("query_label")))
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
    }
  }

  test("holt-winters integer scaling equals the double recurrence") {
    // pins the MATH, independent of both engines' SQL: a hand-driven
    // α=β=γ=½ (l,b,s[24]) recurrence in plain doubles must equal the
    // 4^t-scaled integer fold after the one division by 2^24 (all states
    // are dyadic with denominator ≤ 2^24, so doubles are exact too)
    import TestSpark.spark
    import spark.implicits._
    val xs = (0 to 35).map(t => (t % 7) * 3L + (t % 5) + (if (t > 29) 11L else 0L))
    val pm = xs.zipWithIndex.map { case (c, h) => ("t", 100L + h, c) }
      .toDF("event_type", "h", "c")
    val row = graft.queries.AdvancedOps.holtWintersTail(pm).collect()(0)
    // reference: textbook double recurrence
    var l = xs(23).toDouble
    var b = 0.0
    val s = Array.tabulate(24)(j => xs(j).toDouble - xs(23).toDouble)
    for (t <- 24 to 35) {
      val sOld = s(t % 24)
      val lNew = 0.5 * (xs(t) - sOld) + 0.5 * (l + b)
      val bNew = 0.5 * (lNew - l) + 0.5 * b
      s(t % 24) = 0.5 * (xs(t) - lNew) + 0.5 * sOld
      l = lNew; b = bNew
    }
    assert(row.getAs[Double]("level") == l)
    assert(row.getAs[Double]("trend") == b)
    assert(row.getAs[Double]("season_next") == s(12))
    assert(row.getAs[Double]("forecast_1") == l + b + s(12))
  }

  test("haar tail equals the textbook lifting transform (round 9)") {
    // pins the MATH independent of both engines' SQL: plain-Scala
    // unnormalized Haar over the 16-point anchored grid must equal the
    // SQL fold's energies, dominant level, and share
    import TestSpark.spark
    import spark.implicits._
    val xs = (0 to 15).map(t => ((t % 7) * 5 + (t % 3) * 2 + t).toLong)
    val pm = xs.zipWithIndex.map { case (c, h) => ("t", 200L + h, c) }
      .toDF("event_type", "h", "c")
    val row = graft.queries.SignalOps.haarTail(pm).collect()(0)
    var cur = xs.toArray
    val e = Array.fill(5)(0L)
    for (l <- 1 to 4) {
      val a = Array.tabulate(cur.length / 2)(i => cur(2 * i) + cur(2 * i + 1))
      val d = Array.tabulate(cur.length / 2)(i => cur(2 * i) - cur(2 * i + 1))
      e(l) = d.map(x => x * x).sum
      cur = a
    }
    assert(row.getAs[Long]("total") == xs.sum)
    (1 to 4).foreach(l => assert(row.getAs[Long](s"e$l") == e(l)))
    val w = Array(0L, e(1) * 8, e(2) * 4, e(3) * 2, e(4))
    val dom = (1 to 4).maxBy(l => (w(l), -l))
    assert(row.getAs[Long]("dom_level") == dom.toLong)
    assert(row.getAs[Double]("dom_share") ==
      w(dom).toDouble / w.sum.toDouble)
  }

  test("forwardAsOf: earliest at-or-after match, null when none (round 9)") {
    val left = Seq((1L, 10L, "p1"), (1L, 25L, "p2"), (2L, 5L, "p3"))
      .toDF("user_id", "ems", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 12L, 101L), (1L, 20L, 102L),
        (3L, 1L, 103L))
      .toDF("user_id", "c_ems", "click_id")
    val out = AsOfJoin.forwardAsOf(left, right, Seq("user_id"),
        "ems", "c_ems", rightCols = Seq("c_ems", "click_id"),
        tieBreak = "click_id")
      .orderBy("tag").collect()
    // p1: exact-ts click at 10 matches (>= semantics)
    assert(out(0).getAs[Long]("c_ems") == 10L)
    assert(out(0).getAs[Long]("click_id") == 100L)
    // p2: no click at/after 25 -> null
    assert(out(1).isNullAt(out(1).fieldIndex("c_ems")))
    // p3: user 2 has no clicks at all -> null
    assert(out(2).isNullAt(out(2).fieldIndex("c_ems")))
  }

  test("forwardAsOf: equal-ts right ties resolve to smallest tieBreak") {
    val left = Seq((1L, 10L)).toDF("user_id", "ems")
    val right = Seq((1L, 15L, 7L), (1L, 15L, 3L), (1L, 16L, 1L))
      .toDF("user_id", "c_ems", "click_id")
    val out = AsOfJoin.forwardAsOf(left, right, Seq("user_id"),
      "ems", "c_ems", rightCols = Seq("c_ems", "click_id"),
      tieBreak = "click_id").collect()(0)
    assert(out.getAs[Long]("c_ems") == 15L)
    assert(out.getAs[Long]("click_id") == 3L)
  }

  test("two-phase exact percentiles equal the full sort (round 9)") {
    import TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("rel_exact_percentiles")(spark, dir)
      .collect().map(r =>
        (r.getAs[Long]("p"), r.getAs[Long]("k"), r.getAs[Long]("cents")))
    val cents = graft.core.Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    got.foreach { case (p, k, c) =>
      assert(k == (n * p + 99) / 100)
      assert(c == cents((k - 1).toInt), s"p$p")
    }
  }

  test("percentileSelect picks the exact kth element (round 9)") {
    import TestSpark.spark
    // adversarial shape: duplicate-heavy values spanning several buckets
    val cents = (1 to 997).map(i => ((i * 37) % 223) * 1500L + i % 3)
    val df = cents.toDF("cents")
      .withColumn("bucket", expr("cents div 1000"))
    val hist = df.groupBy(col("bucket"))
      .agg(count(lit(1)).as("bn"))
    val got = graft.queries.SignalOps.percentileSelect(df, hist)
      .collect().map(r => (r.getAs[Long]("p"), r.getAs[Long]("cents")))
    val sorted = cents.sorted
    got.foreach { case (p, c) =>
      val k = (997L * p + 99) / 100
      assert(c == sorted((k - 1).toInt), s"p$p")
    }
  }

  test("PCA power iteration: normalization + positive Rayleigh (round 9)") {
    import TestSpark.spark
    val rows = graft.SparkEntry.queries("emb_pca_power")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 64)
    // the max-|loading| dimension carries exactly +-1e6 (the HITS-style
    // integer normalization invariant), and the scatter matrix's top
    // Rayleigh quotient is positive
    assert(rows.map(r => math.abs(r.getAs[Long]("v_scaled"))).max == 1000000L)
    assert(rows.head.getAs[Double]("rayleigh") > 0.0)
  }

  test("audio fingerprint: bit packing matches an independent recompute " +
      "(round 11)") {
    import TestSpark.spark
    import graft.pipeline.Multimodal
    import spark.implicits._
    // independent reimplementation of the energy-delta fingerprint from
    // the generator formula — never touches a WAV byte
    def expected(e: Long, pert: Long): (Long, Seq[Long]) = {
      val n = (400 + e % 100).toInt
      val fc = n / 8
      val en = (0 until fc).map { f =>
        (8 * f until 8 * (f + 1)).map { i =>
          val d = if (pert == 1L && i == 5) 1L else 0L
          val s = ((31L * i * i + 7L * i + 13L * e + 97L * e * i + d)
            % 65536L) - 32768L
          s * s
        }.sum
      }
      val w = new Array[Long](4)
      for (b <- 0 until fc - 1 if en(b + 1) > en(b))
        w(b / 16) |= (1L << (b % 16))
      (fc.toLong, w.toSeq)
    }
    val ids = Seq(0L, 3L, 17L, 49L, 90L + 9L, 123L, 456L, 789L)
    val fps = Multimodal.audioFingerprint(
        Multimodal.synthNearDupAudioTable(spark, ids.toDF("doc_id")))
      .collect().map(f => f.media_id -> f).toMap
    ids.foreach { id =>
      val e = if (id % 10 == 9) id / 10 else id
      val pert = if (id % 10 == 9) 1L else 0L
      val (fc, ws) = expected(e, pert)
      val f = fps(id)
      assert((f.fc, Seq(f.w0, f.w1, f.w2, f.w3)) == (fc, ws), s"id=$id")
    }
  }

  test("audio fingerprint: a perturbed copy differs from its base in at " +
      "most delta bit 0 (round 11)") {
    import TestSpark.spark
    import graft.pipeline.Multimodal
    import spark.implicits._
    // sample 5 lives in frame 0, whose energy feeds ONLY the E1>E0
    // comparison — so the dup-pair Hamming is <= 1 by construction, for
    // every base (no recall knob to tune; asserted over a spread of es)
    // es with e % 10 == 9 are themselves perturbed renders of e/10 (the
    // corpus rule), so their "base" has a different length — skip them,
    // exactly as the query's measured-recall note does
    val es = (0L until 40L).map(_ * 7L + 1L).filterNot(_ % 10L == 9L)
    val ids = es ++ es.map(_ * 10L + 9L)
    val fps = Multimodal.audioFingerprint(
        Multimodal.synthNearDupAudioTable(spark, ids.toDF("doc_id")))
      .collect().map(f => f.media_id -> f).toMap
    es.foreach { e =>
      val a = fps(e); val b = fps(e * 10L + 9L)
      assert(a.fc == b.fc)
      assert((a.w0 ^ b.w0) <= 1L && (a.w1 ^ b.w1) == 0L &&
        (a.w2 ^ b.w2) == 0L && (a.w3 ^ b.w3) == 0L,
        s"e=$e: only delta bit 0 may differ")
    }
  }

  test("video keyframe hash matches an independent recompute (round 11)") {
    import TestSpark.spark
    import graft.pipeline.Multimodal
    import spark.implicits._
    // independent reimplementation from the LCG pixel formula — never
    // touches a container byte; checks the RIFF walk, the bottom-up DIB
    // row flip, the 4-byte stride, BGR order, and the NN sampling at once
    def expected(e: Long, pert: Boolean): Seq[(Long, Long)] = {
      val w = 8 + (e % 5).toInt; val h = 6 + (e % 7).toInt
      val nf = 3 + (e % 4).toInt
      (0 until nf).map { f =>
        val gray = for (ty <- 0 until 4; tx <- 0 until 4) yield {
          val sx = tx * w / 4; val sy = ty * h / 4
          val v = (1103515245L * (sx + 16L * sy + 256L * f + 4096L * e) +
            12345L) % 2147483648L
          val b0 = v % 256L
          val blu = if (pert && f == 0 && sx == 0 && sy == 0)
            (b0 + 128L) % 256L else b0
          299L * ((v / 65536L) % 256L) + 587L * ((v / 256L) % 256L) +
            114L * blu
        }
        val total = gray.sum
        var hash = 0L
        for (p <- 0 until 16 if gray(p) * 16L >= total) hash |= (1L << p)
        (f.toLong, hash)
      }
    }
    val ids = Seq(0L, 5L, 42L, 139L, 777L)
    val fps = Multimodal.videoFingerprint(
        Multimodal.synthNearDupVideoTable(spark, ids.toDF("doc_id")))
      .collect().groupBy(_.media_id)
    ids.foreach { id =>
      val e = if (id % 10 == 9) id / 10 else id
      val exp = expected(e, id % 10 == 9)
      val got = fps(id).sortBy(_.f).map(r => (r.f, r.hash16)).toSeq
      assert(got == exp, s"id=$id")
    }
  }

  test("streamed-up ANN index compacts without changing answers " +
      "(round 11)") {
    import TestSpark.spark
    import graft.queries.Embeddings
    val root = java.nio.file.Files.createTempDirectory("graft_ann_cmp_")
    val store = new graft.store.OnlineStore(spark, root.toString,
      nBuckets = 8)
    Embeddings.buildIncrementalIvfadc(spark, "/root/testdata/sf0.001", store)
    def partFiles(): Long = {
      import scala.jdk.CollectionConverters._
      val hist = root.resolve("history").resolve("ann_codes")
      val walk = java.nio.file.Files.walk(hist)
      try walk.iterator().asScala
        .count(p => p.getFileName.toString.startsWith("part-")).toLong
      finally walk.close()
    }
    val filesBefore = partFiles()
    val before = Embeddings.ivfadcAnswerFrom(spark, store).collect()
    store.compactHistory(Embeddings.annCodesView)
    val after = Embeddings.ivfadcAnswerFrom(spark, store).collect()
    assert(before.map(_.toString).toSeq == after.map(_.toString).toSeq)
    // compaction preserves batch IDENTITY (partitionBy batch — PIT reads
    // still resolve) but coalesces the per-batch file spray to one
    val hist = store.history(Embeddings.annCodesView)
      .select(col("_batch_seq")).distinct().count()
    assert(hist == 2L, s"batch identities must survive compaction: $hist")
    // at sf0.001 each MERGE batch already lands as one file, so equality
    // is the floor; the file-spray reduction itself is StoreSpec's
    // compaction territory — THIS spec pins the ANN-index answer
    val filesAfter = partFiles()
    assert(filesAfter <= filesBefore,
      s"compaction grew files: $filesBefore -> $filesAfter")
  }

  test("U-shaped attribution credits conserve and split 40/20/40 (round 11)") {
    import TestSpark.spark
    // every purchase's credits must sum EXACTLY to floor(value*1e6):
    // the channel rollup therefore conserves total purchase micro-value
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("evt_attribution_position")(spark, dir)
      .agg(sum(col("credit_micro"))).head().getLong(0)
    val total = graft.core.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * lit(1000000.0)).cast("long")))
      .head().getLong(0)
    assert(out == total, s"credits $out != purchase total $total")
    // hand-computed splits: base 1000000, window positions oldest-first
    def split(base: Long, m: Int): Seq[Long] = {
      if (m == 1) Seq(base)
      else {
        val first = base * 2 / 5
        val mid = if (m >= 3) base / 5 / (m - 2) else 0L
        (0 until m).map { i =>
          if (i == 0) first
          else if (i == m - 1) base - first - (m - 2) * mid
          else mid
        }
      }
    }
    assert(split(1000000L, 1) == Seq(1000000L))
    assert(split(1000000L, 2) == Seq(400000L, 600000L)) // shared fifth -> last
    assert(split(1000000L, 3) == Seq(400000L, 200000L, 400000L))
    assert(split(1000001L, 5) == Seq(400000L, 66666L, 66666L, 66666L, 400003L))
    assert(split(1000001L, 5).sum == 1000001L) // remainder lands on last
  }

  test("CCNet terciles are balanced and ordered per language (round 11)") {
    import TestSpark.spark
    val rows = graft.SparkEntry.queries("text_ccnet_buckets")(
      spark, "/root/testdata/sf0.001").collect()
    rows.groupBy(_.getAs[String]("lang")).values.foreach { rs =>
      val byB = rs.sortBy(_.getAs[Long]("bucket"))
      assert(byB.map(_.getAs[Long]("bucket")).toSeq == Seq(1L, 2L, 3L))
      val ns = byB.map(_.getAs[Long]("n_docs"))
      assert(ns.max - ns.min <= 1, s"ntile balance: ${ns.toSeq}")
      // head's worst score >= middle's best boundary ... ordering holds
      // across buckets: every bucket's best <= previous bucket's worst
      val worst = byB.map(_.getAs[Double]("worst_logp"))
      val best = byB.map(_.getAs[Double]("best_logp"))
      assert(best(1) <= worst(0) && best(2) <= worst(1))
      assert(byB.map(_.getAs[Boolean]("kept")).toSeq ==
        Seq(true, true, false))
    }
  }

  test("ColBERT MaxSim dominates the pooled cosine discipline (round 11)") {
    import TestSpark.spark
    // MaxSim >= sum of diagonal cosines is NOT generally true, but every
    // per-i max is >= the matching diagonal term; spot-check the
    // structural invariants instead: 5 queries x 5 ranks, scores sorted
    // desc per query, self never returned
    val rows = graft.SparkEntry.queries("emb_colbert_maxsim")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 25)
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
      val scores = sorted.map(_.getAs[Double]("maxsim"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(!rs.exists(r =>
        r.getAs[Long]("doc_id") == r.getAs[Long]("query_id")))
      // 8 per-token maxes of cosines each in [-1, 1]
      assert(scores.forall(s => s >= -8.0 && s <= 8.0))
    }
  }

  test("Kaplan-Meier curve is monotone and the life table telescopes " +
      "(round 11)") {
    import TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("evt_survival_km")(spark, dir)
      .collect().sortBy(_.getAs[Long]("h"))
    assert(rows.nonEmpty)
    // survival never increases
    val surv = rows.map(_.getAs[Double]("surv"))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-12 })
    // risk set telescopes: n_risk(next) = n_risk - events - censored
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b.getAs[Long]("n_risk") ==
        a.getAs[Long]("n_risk") - a.getAs[Long]("n_events") -
          a.getAs[Long]("n_censored"))
    }
    // every user leaves exactly once
    val total = rows.map(r =>
      r.getAs[Long]("n_events") + r.getAs[Long]("n_censored")).sum
    assert(total == rows.head.getAs[Long]("n_risk"))
  }

  test("isotonic calibration is monotone and mass-preserving (round 11)") {
    import TestSpark.spark
    val rows = graft.SparkEntry.queries("ml_isotonic_calibration")(
      spark, "/root/testdata/sf0.001").collect()
      .sortBy(_.getAs[Long]("score"))
    val iso = rows.map(_.getAs[Double]("rate_iso"))
    assert(iso.zip(iso.tail).forall { case (a, b) => b >= a - 1e-12 })
    // isotonic L2 fit preserves total weighted mass: sum n_i * iso_i =
    // sum pos_i (pool-adjacent replaces each block with its mean)
    val mass = rows.map(r => r.getAs[Long]("n") * r.getAs[Double]("rate_iso")).sum
    val pos = rows.map(_.getAs[Long]("n_pos")).sum.toDouble
    assert(math.abs(mass - pos) < 1e-6 * pos.max(1.0),
      s"mass $mass != positives $pos")
  }

  test("integer-log NDCG: weights and ideal DCG match the closed form " +
      "(round 11)") {
    import TestSpark.spark
    // weight(pos) = 12 div bitlen(pos+1) for pos 1..10
    val w = (1 to 10).map(p => 12 / (64 - java.lang.Long.numberOfLeadingZeros(p + 1L)))
    assert(w == Seq(6, 6, 4, 4, 4, 4, 3, 3, 3, 3))
    val cumw = w.scanLeft(0L)(_ + _).tail // ideal DCG for n_rel = 1..10
    val rows = graft.SparkEntry.queries("ml_ndcg_eval")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nRel = r.getAs[Long]("n_rel").toInt
      val idcg = r.getAs[Long]("idcg_s")
      assert(idcg == (if (nRel == 0) 0L else cumw(nRel - 1)),
        s"idcg $idcg for n_rel $nRel")
      val ndcg = r.getAs[Double]("ndcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0)
      assert(r.getAs[Long]("dcg_s") <= idcg)
    }
  }

  test("nearestAsOf: direction picks, backward ties, and null edges " +
      "(round 11)") {
    import TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L))
      .toDF("k", "ts")
    val right = Seq(
      (1L, 8L, "b"), (1L, 12L, "f"),   // tie |gap|=2 -> backward
      (2L, 14L, "fwd_only"),           // only forward exists
      (3L, 3L, "back_far"), (3L, 11L, "fwd_near") // forward closer
      // k=4: no right rows -> null match
    ).toDF("k", "rts", "tag")
    val out = AsOfJoin.nearestAsOf(left, right, Seq("k"), "ts", "rts",
        rightCols = Seq("rts", "tag"), tieBreak = "rts")
      .collect().map(r => r.getAs[Long]("k") ->
        Option(r.getAs[String]("tag"))).toMap
    assert(out(1L) == Some("b"))         // equal gap resolves backward
    assert(out(2L) == Some("fwd_only"))  // no backward candidate
    assert(out(3L) == Some("fwd_near"))  // 1 < 7
    assert(out(4L) == None)              // no candidates at all
    // equal-ts right row is visible in BOTH directions (<= and >=)
    val eq = AsOfJoin.nearestAsOf(
      Seq((9L, 10L)).toDF("k", "ts"),
      Seq((9L, 10L, "at")).toDF("k", "rts", "tag"),
      Seq("k"), "ts", "rts", Seq("tag"), "rts").collect()
    assert(eq.head.getAs[String]("tag") == "at")
  }

  test("funnel audit partitions the corpus and agrees with the funnel " +
      "(round 11)") {
    import TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val audit = graft.SparkEntry.queries("corpus_funnel_audit")(spark, dir)
      .collect()
    val funnel = graft.SparkEntry.queries("corpus_curation_funnel")(spark, dir)
      .collect().map(r =>
        r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    // every doc appears exactly once across first-reject stages + kept
    assert(audit.map(_.getAs[Long]("n_docs")).sum == funnel("total"))
    // kept == the funnel's final survivor count
    val kept = audit.find(_.getAs[String]("stage") == "kept")
      .map(_.getAs[Long]("n_docs")).getOrElse(0L)
    assert(kept == funnel("decontaminated"))
    // cumulative cross-check: docs rejected at or before stage k =
    // total - funnel survivor count at stage k
    val rejectedByQuality = audit.filter(_.getAs[Long]("stage_id") == 2L)
      .map(_.getAs[Long]("n_docs")).sum
    assert(rejectedByQuality == funnel("total") - funnel("quality"))
  }

  test("Brier decomposition satisfies REL - RES + UNC = Brier (round 11)") {
    import TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("ml_brier_decomposition")(spark, dir)
      .collect()
    val rel = rows.map(_.getAs[Double]("reliability_c")).sum
    val res = rows.map(_.getAs[Double]("resolution_c")).sum
    val unc = rows.head.getAs[Double]("uncertainty")
    // independent Brier: mean (f - y)^2 over the raw events
    // note the D suffixes: bare 1.0 in Spark SQL text is a DECIMAL literal
    val brier = graft.core.Tables.events(spark, dir)
      .selectExpr(
        """((case when value > 50.0D then 1 else 0 end
          | + case when value > 80.0D then 1 else 0 end
          | + case when (unix_millis(cast(ts as timestamp)) div 3600000) % 24 < 6
          |        then 1 else 0 end
          | + case when user_id % 3 = 0 then 1 else 0 end) / 4.0D
          | - case when event_type = 'purchase' then 1.0D else 0.0D end)
          |as d""".stripMargin.replaceAll("\n", " "))
      .agg(avg(expr("d * d"))).head().getDouble(0)
    assert(math.abs((rel - res + unc) - brier) < 1e-9,
      s"decomposition ${rel - res + unc} != brier $brier")
  }

  test("Qini curve's final point matches the overall uplift total " +
      "(round 11)") {
    import TestSpark.spark
    val rows = graft.SparkEntry.queries("ml_qini_uplift")(
      spark, "/root/testdata/sf0.001").collect()
    val nt = rows.map(_.getAs[Long]("nt")).sum
    val nc = rows.map(_.getAs[Long]("nc")).sum
    val pt = rows.map(_.getAs[Long]("pt")).sum
    val pc = rows.map(_.getAs[Long]("pc")).sum
    val lastQini = rows.minBy(_.getAs[Long]("score")).getAs[Double]("qini")
    val expected = pt - pc.toDouble * nt / nc
    assert(math.abs(lastQini - expected) < 1e-9)
  }

  test("average precision agrees with NDCG on relevant-set sizes and " +
      "bounds (round 11)") {
    import TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val ap = graft.SparkEntry.queries("ml_average_precision")(spark, dir)
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_rel"), r.getAs[Double]("avg_precision"))).toMap
    val ndcg = graft.SparkEntry.queries("ml_ndcg_eval")(spark, dir)
      .collect().map(r => r.getAs[Long]("query_id") ->
        r.getAs[Long]("n_rel")).toMap
    assert(ap.keySet == ndcg.keySet)
    ap.foreach { case (q, (nRel, p)) =>
      assert(nRel == ndcg(q)) // both evals rank the identical top-10
      assert(p >= 0.0 && p <= 1.0)
      if (nRel == 0) assert(p == 0.0)
    }
  }

  test("Markov stationary scores are max-normalized and ranked (round 11)") {
    import TestSpark.spark
    val rows = graft.SparkEntry.queries("graph_markov_stationary")(
      spark, "/root/testdata/sf0.001").collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(rows.nonEmpty)
    assert(rows.head.getAs[Long]("stationary_fp") == 1000000L) // rank 1 = scale
    val scores = rows.map(_.getAs[Long]("stationary_fp"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length))
  }

  test("bootstrap CI brackets are ordered and replicate the corpus size " +
      "(round 11)") {
    import TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val r = graft.SparkEntry.queries("evt_bootstrap_ci")(spark, dir).head()
    val n = graft.core.Tables.events(spark, dir).count()
    assert(r.getAs[Long]("n") == n)
    val lo = r.getAs[Double]("ci_lo"); val hi = r.getAs[Double]("ci_hi")
    val mean = r.getAs[Double]("mean_value")
    assert(lo <= hi)
    // replicate means concentrate around the point estimate (multiplicity
    // mean 1): the interval must sit within a loose +-20% band
    assert(lo > mean * 0.8 && hi < mean * 1.2, s"[$lo, $hi] vs $mean")
  }

  test("dataset card agrees with the funnel's totals and quality stage " +
      "(round 11)") {
    import TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val card = graft.SparkEntry.queries("corpus_dataset_card")(spark, dir)
      .collect().map(r => r.getAs[String]("metric") -> r).toMap
    val funnel = graft.SparkEntry.queries("corpus_curation_funnel")(spark, dir)
      .collect().map(r =>
        r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
    assert(card("n_docs").getAs[Long]("n") == funnel("total"))
    assert(card("quality_kept").getAs[Long]("n") == funnel("quality"))
    val ratio = card("mean_doc_tokens").getAs[Double]("ratio")
    assert(ratio == card("n_tokens").getAs[Long]("n").toDouble /
      card("n_docs").getAs[Long]("n"))
  }

  test("diff-in-diff equals the recomposed cell rates (round 11)") {
    import TestSpark.spark
    val rows = graft.SparkEntry.queries("ml_diff_in_diff")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 4)
    val r = rows.map(x => (x.getAs[Long]("treat"), x.getAs[Long]("post")) ->
      x.getAs[Double]("rate")).toMap
    val did = rows.head.getAs[Double]("did")
    assert(rows.forall(_.getAs[Double]("did") == did)) // one estimate
    assert(did == (r((1L, 1L)) - r((1L, 0L))) - (r((0L, 1L)) - r((0L, 0L))))
    rows.foreach { x =>
      assert(x.getAs[Double]("rate") ==
        x.getAs[Long]("n_pos").toDouble / x.getAs[Long]("n"))
    }
  }

  test("nprobe sweep: candidates and recall are monotone in nprobe " +
      "(round 11)") {
    import TestSpark.spark
    val rows = graft.SparkEntry.queries("emb_ivf_nprobe_sweep")(
      spark, "/root/testdata/sf0.001").collect()
      .sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == (1L to 5L))
    // probe-p candidate sets are NESTED in probe-(p+1)'s, so both the
    // candidate volume and the hit count can only grow with nprobe
    val cands = rows.map(_.getAs[Long]("total_candidates"))
    assert(cands.zip(cands.tail).forall { case (a, b) => b >= a })
    val hits = rows.map(_.getAs[Long]("total_hits"))
    assert(hits.zip(hits.tail).forall { case (a, b) => b >= a })
    rows.foreach { r =>
      val mr = r.getAs[Double]("mean_recall")
      assert(mr >= 0.0 && mr <= 1.0)
    }
  }

  test("MMD drift: squared-norm non-negativity and exact zero on " +
      "identical samples (round 11)") {
    import TestSpark.spark
    val rows = graft.SparkEntry.queries("drift_mmd_poly")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // MMD^2 (V-statistic) is ||mu_x - mu_y||^2 in the RKHS: >= 0 up to
    // the closing double combination
    rows.foreach { r =>
      val v = r.getAs[Double]("mmd2")
      assert(v >= -1e-3, s"${r.getAs[String]("event_type")}: $v")
    }
    // identical moment sets cancel EXACTLY (same doubles subtract to 0)
    import spark.implicits._
    val same = Seq(("t", 7L, 7L, 123456L, 123456L, 99L, 99L))
      .toDF("event_type", "nx", "ny", "sx", "sy", "sxx", "syy")
    val z = graft.queries.DriftQuality.mmdFromMoments(same)
      .head().getAs[Double]("mmd2")
    assert(z == 0.0, s"MMD(X,X) = $z")
  }

  test("HITS scores are max-normalized each round (round 9)") {
    import TestSpark.spark
    val rows = graft.SparkEntry.queries("graph_hits")(
      spark, "/root/testdata/sf0.001").collect()
    val roles = rows.groupBy(_.getAs[String]("role"))
    assert(roles.keySet == Set("hub", "auth"))
    roles.values.foreach { rs =>
      val top = rs.minBy(_.getAs[Long]("rank"))
      // rank 1 carries the scale itself: (max*S) div max == S
      assert(top.getAs[Long]("score") == 1000000000L)
      val scores = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ECE recomposes from hand-computed bins (round 12)") {
    import TestSpark.spark
    import spark.implicits._
    // bins: (score 0, n 4, pos 1) -> conf 0.0, acc 0.25, term 4*0.25 = 1.0
    //       (score 4, n 6, pos 3) -> conf 1.0, acc 0.5,  term 6*0.5  = 3.0
    // N = 10, micro sum 4e6 -> ECE = 4e6 / 1e7 = 0.4 exactly
    val bins = Seq((0L, 4L, 1L), (4L, 6L, 3L)).toDF("score", "n", "pos")
    val rows = graft.queries.AdvancedOps.eceFromBins(bins).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("contrib_micro") == 1000000L)
    assert(rows(1).getAs[Long]("contrib_micro") == 3000000L)
    rows.foreach(r => assert(r.getAs[Double]("ece") == 0.4))
  }

  test("S-curve: expected-rate identity, bounds, and the certain tail " +
      "(round 12)") {
    import TestSpark.spark
    val rows = graft.SparkEntry.queries("dedup_minhash_scurve")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_pairs")
      val micro = r.getAs[Long]("micro_sum")
      val d = r.getAs[Long]("decile")
      assert(d >= 0 && d <= 9)
      assert(micro >= 0 && micro <= n * 1000000L)
      // the reported expectation IS the quantized integer mean — no
      // second arithmetic path
      assert(r.getAs[Double]("expected_rate") ==
        micro.toDouble / (n * 1000000L).toDouble)
      val m = r.getAs[Double]("measured_rate")
      assert(m >= 0.0 && m <= 1.0)
    }
    // analytic endpoint: decile 9 means J >= 0.9, where
    // 1-(1-J^2)^4 >= 1-0.19^4 = 0.9987 — near-identical pairs must be
    // expected to collide
    rows.filter(_.getAs[Long]("decile") == 9).foreach { r =>
      assert(r.getAs[Double]("expected_rate") > 0.99)
    }
  }

  test("keep-best selects exactly one survivor per cluster (round 12)") {
    import TestSpark.spark
    val df = graft.SparkEntry.queries("dedup_keep_best")(
      spark, "/root/testdata/sf0.001")
    val perCluster = df.groupBy(col("cluster_id"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
        count(org.apache.spark.sql.functions.lit(1)).as("n_members"))
      .collect()
    assert(perCluster.nonEmpty)
    perCluster.foreach { r =>
      assert(r.getAs[Long]("n_keep") == 1L,
        s"cluster ${r.get(0)} kept ${r.getAs[Long]("n_keep")}")
      assert(r.getAs[Long]("n_members") >= 2L,
        "a near-dup cluster needs at least two members")
    }
  }

  test("paragraph dedup: conservation, fraction bounds, and both dup " +
      "regimes present (round 13)") {
    import TestSpark.spark
    val df = graft.SparkEntry.queries("dedup_paragraph")(
      spark, TestSpark.sf0001).collect()
    assert(df.nonEmpty)
    // conservation: per-doc paragraph counts must sum to the
    // independently-computed ceil(tokens/30) total
    val expectedParas = spark.read
      .parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(expr("greatest((size(split(trim(text), '\\\\s+')) + 29) " +
        "div 30, 1)").as("np"))
      .agg(sum(col("np"))).collect()(0).getLong(0)
    assert(df.map(_.getAs[Long]("n_paras")).sum == expectedParas)
    df.foreach { r =>
      val (np, nd, f) = (r.getAs[Long]("n_paras"),
        r.getAs[Long]("n_dup_paras"), r.getAs[Double]("dup_fraction"))
      assert(nd >= 0 && nd <= np, s"doc ${r.get(0)}: $nd of $np dup")
      assert(f >= 0.0 && f <= 1.0 && f == nd.toDouble / np)
    }
    // the corpus carries whole-doc near-dups (fraction 1) AND at least
    // one partially-copied doc (0 < fraction < 1) — the D4 signal this
    // query exists for; a corpus regen that loses either regime should
    // be noticed, not silently graded vacuously
    assert(df.exists(_.getAs[Double]("dup_fraction") == 1.0))
    assert(df.exists { r =>
      val f = r.getAs[Double]("dup_fraction"); f > 0.0 && f < 1.0
    })
  }

  test("incremental dedup equals the full rank-ordered pairing " +
      "restricted to new docs, incl. the old-id-after-new boundary " +
      "(round 13)") {
    import TestSpark.spark
    graft.functions.SortedIntersectCount.register(spark)
    val got = graft.SparkEntry.queries("dedup_incremental_bands")(
      spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_matches"), r.getAs[Boolean]("is_dup"))).toMap
    assert(got.nonEmpty && got.keySet.forall(_ % 3 == 0))
    got.values.foreach { case (nc, nm, dup) =>
      assert(nm <= nc && dup == (nm > 0))
    }
    // independent reference: FULL both-direction pairing under the
    // (is_new, doc_id) rank, restricted to new docs at the END — the
    // assembly the oracle uses, rebuilt with engine primitives
    val sig = graft.queries.TextAnalysis.fuzzySigRows(
      spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
        .select(col("doc_id"), col("text")))
    val bands = sig.select(col("doc_id"), explode(col("bands")).as("bv"))
    def rank(c: org.apache.spark.sql.Column) =
      when(c % 3 === 0, 1L).otherwise(0L) * 100000 + c
    val pairs = bands.select(col("bv"), col("doc_id").as("x"))
      .join(bands.select(col("bv"), col("doc_id").as("y")), Seq("bv"))
      .filter(rank(col("y")) < rank(col("x")))
      .select(col("x"), col("y")).distinct()
      .join(sig.select(col("doc_id").as("x"), col("sj").as("sx")), Seq("x"))
      .join(sig.select(col("doc_id").as("y"), col("sj").as("sy")), Seq("y"))
      .withColumn("conf", expr("sorted_intersect_count(sx, sy)") * 3 >=
        size(col("sx")).cast("long") + size(col("sy")))
    val ref = pairs.filter(col("x") % 3 === 0)
      .groupBy(col("x"))
      .agg(count(lit(1)).as("nc"),
        sum(when(col("conf"), 1L).otherwise(0L)).as("nm"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.foreach { case (id, (nc, nm, _)) =>
      val (rc, rm) = ref.getOrElse(id, (0L, 0L))
      assert((nc, nm) == (rc, rm),
        s"doc $id: query ($nc,$nm) vs reference ($rc,$rm)")
    }
    // the boundary that makes the rank order matter: at least one NEW
    // doc must be marked dup via an OLD doc with a LARGER id (plain
    // id-order keep-first would let it survive)
    val boundary = pairs
      .filter(col("x") % 3 === 0 && col("y") % 3 =!= 0 &&
        col("y") > col("x") && col("conf"))
      .count()
    assert(boundary > 0, "corpus lost the old-id-after-new dup case")
  }
}
