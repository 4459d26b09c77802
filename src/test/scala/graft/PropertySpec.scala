package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin
import graft.streaming.StatefulFeatures
import graft.streaming.StatefulFeatures.EventIn

/** Property-based invariants (ScalaCheck): window-eviction correctness of
  * the stateful op vs a naive reference, PIT-join correctness vs a naive
  * per-row maximum, and decomposable-aggregate equivalence (tumbling
  * partials rolled up == direct sliding windows — the partial+final
  * aggregation pattern the 24h/1m horizon relies on at scale). */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def check(p: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withInitialSeed(42L), p)
    assert(res.passed, res.status.toString)
  }

  // coarse timestamp grid (x20000) so tied timestamps are common — RANGE
  // frames treat tie peers symmetrically and the stateful op must agree
  private val eventsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 30)
    ts <- Gen.listOfN(n, Gen.choose(0L, 40L).map(_ * 20000L))
    keys <- Gen.listOfN(n, Gen.choose(1L, 3L))
  } yield ts.zip(keys)

  test("RankedWindow.rankDesc equals the naive global-sort window") {
    import org.apache.spark.sql.expressions.Window
    // values from a small grid -> tie-heavy; unique tie column
    val gen: Gen[List[Double]] = for {
      n <- Gen.choose(1, 40)
      vs <- Gen.listOfN(n, Gen.choose(0, 8).map(_ * 1.5))
    } yield vs
    check(Prop.forAll(gen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val fast = graft.operators.RankedWindow
        .rankDesc(df, col("v"), col("id"), tiles = 4, nBuckets = 4)
        .select("id", "rnk", "dense_rnk", "pct_rank", "quartile")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
      val w = Window.orderBy(col("v").desc, col("id"))
      val naive = df
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("dense_rnk", dense_rank().over(w).cast("long"))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .select("id", "rnk", "dense_rnk", "pct_rank", "quartile")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
      fast == naive
    }, n = 6)
  }

  test("connected components equal brute-force transitive closure") {
    val gen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(0, 25)
      es <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))
    } yield es.filter(e => e._1 != e._2)
    check(Prop.forAll(gen) { es =>
      val got =
        if (es.isEmpty) Map.empty[Long, Long]
        else graft.operators.ConnectedComponents
          .components(es.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force: iterate min-label over an adjacency map to fixpoint
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val adj = (es ++ es.map(_.swap)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2) }
      var lbl = nodes.map(n => n -> n).toMap
      var changed = true
      while (changed) {
        changed = false
        nodes.foreach { n =>
          val m = (lbl(n) +: adj.getOrElse(n, Nil).map(lbl)).min
          if (m < lbl(n)) { lbl += n -> m; changed = true }
        }
      }
      got == lbl
    }, n = 6)
  }

  test("streaming HLL registers equal the batch registers under any batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SketchState
    import SketchState.HllIn
    implicit val ctx = spark.sqlContext
    val m = 8
    val gen: Gen[(List[(Int, Int)], Int, Long)] = for {
      n <- Gen.choose(1, 20)
      bs <- Gen.listOfN(n, Gen.choose(0, m - 1))
      rs <- Gen.listOfN(n, Gen.choose(1, 12))
      nb <- Gen.choose(1, 4)
      seed <- Gen.choose(0L, 1000L)
    } yield (bs.zip(rs), nb, seed)
    check(Prop.forAll(gen) { case (obs, nb, seed) =>
      val events = obs.map { case (b, r) => HllIn("k", b, r) }
      val shuffled = new scala.util.Random(seed).shuffle(events)
      val batches = shuffled.grouped(math.max(1, shuffled.size / nb)).toSeq
      val in = MemoryStream[HllIn]
      val name = s"hll_prop_${seed}_${obs.size}_$nb"
      val q = SketchState.hllRegisters(in.toDS(), m).toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()
      val fin = spark.table(name).collect()
        .map(r => r.getAs[Long]("rev") -> r.getSeq[Int](1))
        .maxBy(_._1)._2
      spark.catalog.dropTempView(name)
      // batch truth: per-bucket max over the full observation set
      val truth = (0 until m).map(b =>
        obs.filter(_._1 == b).map(_._2).foldLeft(0)(math.max))
      fin == truth
    }, n = 5)
  }

  test("update-mode retraction reaches the RANGE frame under any batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    // tie-heavy grid well inside one horizon (no eviction in play), events
    // SHUFFLED and split into arbitrary micro-batches
    val gen: Gen[(List[(Long, Long)], Int, Long)] = for {
      n <- Gen.choose(1, 16)
      ts <- Gen.listOfN(n, Gen.choose(0L, 30L).map(_ * 20000L))
      keys <- Gen.listOfN(n, Gen.choose(1L, 2L))
      nb <- Gen.choose(1, 4)
      seed <- Gen.choose(0L, 1000L)
    } yield (ts.zip(keys), nb, seed)
    check(Prop.forAll(gen) { case (evs, nb, seed) =>
      val events = evs.zipWithIndex.map { case ((t, k), i) =>
        EventIn(i.toLong + 1, k, t, 1.0)
      }
      val shuffled = new scala.util.Random(seed).shuffle(events)
      val batches = shuffled.grouped(math.max(1, shuffled.size / nb)).toSeq
      val in = MemoryStream[EventIn]
      val name = s"retraction_prop_${seed}_${evs.size}_$nb"
      val q = StatefulFeatures.anchoredCountsUpdate(in.toDS()).toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()
      val fin = spark.table(name).collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("cnt_24h"),
          r.getAs[Long]("cnt_5m")))
        .groupBy(_._1).map { case (id, rows) =>
          id -> rows.map(r => (r._2, r._3)).maxBy(_._1)
        }
      spark.catalog.dropTempView(name)
      // RANGE-frame truth over the full event set
      events.forall { e =>
        def cnt(h: Long) =
          events.count(x => x.user_id == e.user_id &&
            x.ems > e.ems - h && x.ems <= e.ems).toLong
        fin(e.event_id) == (cnt(graft.core.Horizons.H24H),
          cnt(graft.core.Horizons.H5M))
      }
    }, n = 5)
  }

  test("session retraction reaches global sessionization under any batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulFeatures.SessEventIn
    implicit val ctx = spark.sqlContext
    // 20-min grid: gaps of 0/20/40... minutes around the 30-min session
    // cut, all inside one horizon; shuffled arbitrary micro-batches
    val gen: Gen[(List[(Long, Long)], Int, Long)] = for {
      n <- Gen.choose(1, 14)
      ts <- Gen.listOfN(n, Gen.choose(0L, 30L).map(_ * 1200000L))
      keys <- Gen.listOfN(n, Gen.choose(1L, 2L))
      nb <- Gen.choose(1, 4)
      seed <- Gen.choose(0L, 1000L)
    } yield (ts.zip(keys), nb, seed)
    check(Prop.forAll(gen) { case (evs, nb, seed) =>
      val events = evs.zipWithIndex.map { case ((t, k), i) =>
        SessEventIn(i.toLong + 1, k, t,
          if (i % 3 == 0) "purchase" else "click")
      }
      val shuffled = new scala.util.Random(seed).shuffle(events)
      val batches = shuffled.grouped(math.max(1, shuffled.size / nb)).toSeq
      val in = MemoryStream[SessEventIn]
      val name = s"sess_prop_${seed}_${evs.size}_$nb"
      val q = StatefulFeatures.sessionStepsUpdate(in.toDS()).toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
      } finally q.stop()
      val fin = spark.table(name).collect()
        .map(r => (r.getAs[Long]("event_id"), (r.getAs[Long]("rev"),
          (r.getAs[Long]("session_events"),
            r.getAs[Double]("session_duration_min"),
            r.getAs[Long]("purchases_so_far"),
            r.getAs[Long]("clicks_so_far")))))
        .groupBy(_._1).map { case (id, rows) => id -> rows.map(_._2).maxBy(_._1)._2 }
      spark.catalog.dropTempView(name)
      // global truth: sort per user, sessionize by 30-min gap, run counters
      events.groupBy(_.user_id).forall { case (_, evsU) =>
        val ordered = evsU.sortBy(e => (e.ems, e.event_id))
        var start = 0L; var last = Long.MinValue
        var n = 0L; var p = 0L; var c = 0L
        ordered.forall { e =>
          if (last == Long.MinValue || e.ems - last > 1800000L) {
            start = e.ems; n = 0; p = 0; c = 0
          }
          last = e.ems; n += 1
          if (e.event_type == "purchase") p += 1 else c += 1
          fin(e.event_id) == ((n, (e.ems - start) / 60000.0, p, c))
        }
      }
    }, n = 5)
  }

  test("stateful anchored counts equal the naive per-event window count") {
    check(Prop.forAll(eventsGen) { evs =>
      val in = evs.zipWithIndex.map { case ((t, k), i) =>
        EventIn(i.toLong, k, t, 0.0) }
      val got = StatefulFeatures.anchoredCounts(in.toDS())
        .collect().map(r => r.event_id -> r.cnt_5m).toMap
      in.forall { e =>
        val naive = in.count(o => o.user_id == e.user_id &&
          o.ems > e.ems - 300000L && o.ems <= e.ems)
        got(e.event_id) == naive
      }
    })
  }

  private val pitGen: Gen[(List[(Long, Long)], List[(Long, Long, Double)])] =
    for {
      ln <- Gen.choose(1, 10)
      rn <- Gen.choose(0, 10)
      l <- Gen.listOfN(ln, Gen.zip(Gen.choose(1L, 2L), Gen.choose(0L, 1000L)))
      r <- Gen.listOfN(rn, Gen.zip(Gen.choose(1L, 2L), Gen.choose(0L, 1000L),
        Gen.choose(0.0, 9.0)))
    } yield (l, r)

  test("asOfJoin equals the naive latest-at-or-before per row") {
    check(Prop.forAll(pitGen) { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("qid", "k", "qts")
      val right = rs.zipWithIndex.map { case ((k, t, v), i) =>
        (k, t, v, i.toLong) }.toDF("k", "rts", "rv", "rid")
      val got = AsOfJoin.asOf(left, right, Seq("k"), "qts", "rts",
          Seq("rts", "rv"), "rid")
        .collect().map(r => r.getAs[Long]("qid") ->
          (if (r.isNullAt(r.fieldIndex("rts"))) None
           else Some(r.getAs[Long]("rts")))).toMap
      ls.zipWithIndex.forall { case ((k, t), i) =>
        val naive = rs.filter(r => r._1 == k && r._2 <= t)
          .map(_._2).maxOption
        got(i.toLong) == naive
      }
    })
  }

  test("nearestAsOf equals the naive closest-with-backward-ties per row " +
      "(round 11)") {
    // tie-heavy grid (ts multiples on a small range) so equal backward /
    // forward gaps and equal-ts right rows actually occur
    val gen: Gen[(List[(Long, Long)], List[(Long, Long)])] = for {
      ln <- Gen.choose(1, 10)
      rn <- Gen.choose(0, 10)
      l <- Gen.listOfN(ln, Gen.zip(Gen.choose(1L, 2L),
        Gen.choose(0L, 10L).map(_ * 10L)))
      r <- Gen.listOfN(rn, Gen.zip(Gen.choose(1L, 2L),
        Gen.choose(0L, 10L).map(_ * 10L)))
    } yield (l, r)
    check(Prop.forAll(gen) { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("qid", "k", "qts")
      val right = rs.map { case (k, t) => (k, t) }.toDF("k", "rts")
      val got = AsOfJoin.nearestAsOf(left, right, Seq("k"), "qts", "rts",
          Seq("rts"), "rts")
        .collect().map(r => r.getAs[Long]("qid") ->
          (if (r.isNullAt(r.fieldIndex("rts"))) None
           else Some(r.getAs[Long]("rts")))).toMap
      ls.zipWithIndex.forall { case ((k, t), i) =>
        val cand = rs.filter(_._1 == k).map(_._2)
        val naive =
          if (cand.isEmpty) None
          else {
            // closest |gap|; equal gaps resolve BACKWARD (rts <= qts)
            val best = cand.minBy(rts =>
              (math.abs(rts - t), if (rts <= t) 0 else 1))
            Some(best)
          }
        got(i.toLong) == naive
      }
    })
  }

  test("tumbling 1m partials rolled up equal direct 5m sliding windows") {
    check(Prop.forAll(eventsGen) { evs =>
      val df = evs.map { case (t, k) => (t, k) }.toDF("ems", "k")
        .withColumn("ts", timestamp_millis($"ems"))
      val direct = df
        .groupBy(window($"ts", "5 minutes", "1 minute"), $"k")
        .agg(count(lit(1)).as("n"))
        .select(unix_millis($"window.start").as("ws"), $"k", $"n")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // partial: 1m tumbling counts; final: each 5m sliding window is the
      // sum of its 5 member buckets
      val partial = df
        .groupBy(window($"ts", "1 minute"), $"k")
        .agg(count(lit(1)).as("n"))
        .select(unix_millis($"window.start").as("bs"), $"k", $"n")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      direct.forall { case ((ws, k), n) =>
        val rolled = (0 until 5).map(i => partial.getOrElse((ws + i * 60000L, k), 0L)).sum
        rolled == n
      }
    }, n = 5)
  }

  test("watermark sequence is monotone non-decreasing") {
    check(Prop.forAll(Gen.listOfN(20, Gen.choose(0L, 100000L))) { ts =>
      val wms = ts.scanLeft(Long.MinValue)((wm, t) => math.max(wm, t - 5000L)).tail
      wms.sliding(2).forall {
        case Seq(a, b) => a <= b
        case _ => true
      }
    }, n = 20)
  }
}

/** SURVEY §5 parity property: the event-anchored mode evaluated at an
  * aligned window's last instant equals the aligned window's aggregate —
  * the formal bridge between the reference's per-event semantics and
  * Spark's bucketed window() mode for decomposable features. */
class WindowParitySpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("anchored count at window close == aligned tumbling window count") {
    val rnd = new scala.util.Random(42)
    val events = List.fill(200)((rnd.nextInt(40).toLong * 7919L % 600000L,
      rnd.nextInt(3).toLong + 1L))
    val df = events.toDF("ems", "k").withColumn("ts", timestamp_millis($"ems"))
    val aligned = df.groupBy(window($"ts", "5 minutes"), $"k")
      .agg(count(lit(1)).as("n"))
      .select(unix_millis($"window.start").as("ws"), $"k", $"n")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // probe each nonempty aligned window at its last millisecond with the
    // anchored formulation: events in (probe-300000, probe]
    aligned.foreach { case ((ws, k), n) =>
      val probe = ws + 300000L - 1
      val anchored = events.count { case (t, kk) =>
        kk == k && t > probe - 300000L && t <= probe }
      assert(anchored == n, s"window ($ws,$k): aligned=$n anchored=$anchored")
    }
  }

  // ---------------------------------------------------------------- round 10
  // Weighted-ticket sampling: the streaming twin keeps only the global
  // bottom-32 TICKET hashes per type (SketchState.kmvBottomK) and claims
  // the exact top-8 items by min-ticket are always recoverable from that
  // state. The proof is a pigeonhole bound (a top-8 item's min has at
  // most 7 rivals x <=4 tickets below it); this property drives the
  // recovery over arbitrary weight/hash layouts, including adversarial
  // ones no corpus exercises (all-max weights, dense near-ties).
  private val weightedGen: Gen[List[(Int, Int)]] = for {
    n <- Gen.choose(1, 60)
    ws <- Gen.listOfN(n, Gen.choose(1, 4))
  } yield ws.zipWithIndex.map { case (w, i) => (i, w) }

  test("weighted ticket sample: bottom-32 tickets always recover the exact top-8 (round 10)") {
    val prop = Prop.forAll(weightedGen,
        Gen.choose(Long.MinValue, Long.MaxValue)) {
      (items: List[(Int, Int)], seed: Long) =>
        val rnd = new scala.util.Random(seed)
        // distinct ticket hashes (the md5-60-bit model; collisions are
        // handled by the (h, id) re-rank rule, not this state bound)
        val tickets = items
          .flatMap { case (id, w) =>
            (0 until w).map(_ => (rnd.nextLong() >>> 4, id))
          }
          .groupBy(_._1).map(_._2.head).toList
        val minByItem = tickets.groupBy(_._2)
          .map { case (id, ts) => (ts.map(_._1).min, id) }.toList
        val top8 = minByItem.sorted.take(8)
        val retained = tickets.map(_._1).sorted.take(32).toSet
        val recovered = tickets.filter(t => retained(t._1)).groupBy(_._2)
          .map { case (id, ts) => (ts.map(_._1).min, id) }.toList
          .sorted.take(8)
        recovered == top8
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200).withInitialSeed(42L), prop)
    assert(res.passed, res.status.toString)
  }

  test("minhash fold equals the per-permutation array_min reference " +
      "(round 12)") {
    // the round-12 single-pass fold replaced the transform-of-array_min
    // form everywhere under the minhash family — prove the slot values
    // identical on randomized signatures (the fold's correctness, not
    // the corpus's)
    val rnd = new scala.util.Random(4242)
    val sigs: Seq[Seq[Long]] = (1 to 60).map { _ =>
      Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong().abs % 4294967291L)
    }
    val df = sigs.toDF("si")
    val refExpr =
      """transform(sequence(0, 7), j -> array_min(transform(si,
        |    x -> ((2*j + 1) * x + 97*j + 13) % 2147483647)))""".stripMargin
    val rows = df.selectExpr(
      s"${graft.queries.TextAnalysis.minhashExpr} as a",
      s"$refExpr as b").collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"fold ${r.getSeq[Long](0)} != reference ${r.getSeq[Long](1)}")
    }
    // the empty-signature sentinel: the fold keeps its modulus seed
    // (every guarded consumer filters size(sh) > 0 before bands are
    // built, so the sentinel is unreachable in query output — pin the
    // value so a future consumer without the guard is caught in review)
    val empty = Seq(Seq.empty[Long]).toDF("si")
      .selectExpr(s"${graft.queries.TextAnalysis.minhashExpr} as a")
      .collect().head.getSeq[Long](0)
    assert(empty == Seq.fill(8)(2147483647L))
  }
}
