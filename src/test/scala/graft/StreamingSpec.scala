package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{DlqSplit, StatefulFeatures, StreamingPipelines}
import graft.streaming.StatefulFeatures.EventIn

/** Streaming semantics: stateful per-event emission across micro-batches
  * (incl. late arrival), watermark-driven late-event dropping (W6/W7
  * fixture, FIXTURES.md §7), and the DLQ split (S5). */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("bandStreamReplay staging is STABLE across calls in one process " +
      "(round 13)") {
    // the staged fingerprint-post log must stage once per process and be
    // reused — the round-13 bench caught the content-hash signature
    // embedding Catalyst exprIds (session-lifetime counters), which made
    // the sig differ on every call and restaged the full shingle+md5
    // pass per invocation (stream_dedup_minhash 2.3 -> 16 s). Pin: two
    // consecutive calls leave the _staged marker untouched.
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    StreamingPipelines.bandStreamReplay(spark, sf0001)
    val stageRoot = Paths.get(System.getProperty("java.io.tmpdir"))
    val listing = Files.list(stageRoot)
    // only THIS process's staged dirs (names embed the pid): a concurrent
    // sbt test fork restaging its own dir between the two calls must not
    // flake this pin (round-13 advice)
    val ownSuffix = "_p" + ProcessHandle.current().pid()
    val dirs =
      try listing.iterator().asScala.filter { p =>
        p.getFileName.toString.startsWith("graft_bandreplay_") &&
          p.getFileName.toString.endsWith(ownSuffix) &&
          Files.exists(p.resolve("_staged"))
      }.toList
      finally listing.close()
    assert(dirs.nonEmpty, "no staged band-replay dir found")
    val before = dirs.map(p =>
      p -> Files.getLastModifiedTime(p.resolve("_staged"))).toMap
    StreamingPipelines.bandStreamReplay(spark, sf0001)
    dirs.foreach { p =>
      assert(Files.getLastModifiedTime(p.resolve("_staged")) == before(p),
        s"$p restaged on the second call — signature is not stable")
    }
  }

  test("stateful anchored counts across micro-batches, including a late arrival") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[EventIn]
    val q = StatefulFeatures.anchoredCounts(in.toDS()).toDF()
      .writeStream.format("memory").queryName("anchored_test")
      .outputMode("append").start()
    try {
      // batch 1: three events within 5m of each other
      in.addData(
        EventIn(1, 7, 1000L, 1.0),
        EventIn(2, 7, 61000L, 2.0),
        EventIn(3, 7, 121000L, 3.0))
      q.processAllAvailable()
      // batch 2: one in-order event + one LATE event (ems between 1 and 2)
      in.addData(EventIn(4, 7, 181000L, 4.0), EventIn(5, 7, 30000L, 5.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("anchored_test")
      .orderBy($"event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("cnt_5m"))).toMap
    assert(rows(1) == 1L && rows(2) == 2L && rows(3) == 3L)
    // in-order event 4 (ems 181000, window > -119000) sees 1,2,3, the late
    // event 5 (sorted before it within the batch), and itself — matching
    // the batch RANGE-frame semantics over the full event set
    assert(rows(4) == 5L)
    // late event anchors at its own ts: sees only event 1 (1000) + itself,
    // NOT the newer events already in state
    assert(rows(5) == 2L)
  }

  test("bucketPairs: cross-batch member carry, within-batch id order, " +
      "no reversed or cross-bucket pairs (round 14)") {
    import graft.streaming.StatefulFeatures.{BandIn, BandPair}
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[BandIn]
    val q = StatefulFeatures.bucketPairs(in.toDS()).toDF()
      .writeStream.format("memory").queryName("bucketpairs_test")
      .outputMode("update").start()
    try {
      // batch 1: docs 3 and 9 post band A (out of id order within the
      // batch — the op must sort), doc 6 posts band B
      in.addData(BandIn("A", 9L), BandIn("A", 3L), BandIn("B", 6L))
      q.processAllAvailable()
      // batch 2: doc 12 posts A (pairs with BOTH batch-1 members — the
      // cross-batch carry), doc 15 posts B
      in.addData(BandIn("A", 12L), BandIn("B", 15L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("bucketpairs_test").as[BandPair].collect()
      .map(p => (p.band_val, p.n, p.o)).toSet
    assert(got == Set(
      ("A", 9L, 3L),            // within-batch pair, id-sorted orientation
      ("A", 12L, 3L), ("A", 12L, 9L), // cross-batch member carry
      ("B", 15L, 6L)))
    // orientation invariant: every pair has n (later) > o (earlier)
    assert(got.forall { case (_, n, o) => n > o })
  }

  test("warm start: seeded state folds in, stream-only keys start cold, " +
      "snapshot-only keys never corrupt (round 10)") {
    import graft.streaming.StatefulFeatures.{WarmIn, WarmState, WarmOut}
    implicit val ctx = spark.sqlContext
    // user 1 exists only in the snapshot; user 2 in both; user 3 only in
    // the stream — the three handoff regimes
    val init = Seq((1L, WarmState(3L, 300L)), (2L, WarmState(2L, 200L)))
      .toDS().groupByKey(_._1).mapValues(_._2)
    val in = MemoryStream[WarmIn]
    val q = StatefulFeatures.warmStartCounts(in.toDS(), init).toDF()
      .writeStream.format("memory").queryName("warmstart_test")
      .outputMode("update").start()
    try {
      in.addData(WarmIn(2L, 50L), WarmIn(3L, 10L))
      q.processAllAvailable()
      in.addData(WarmIn(3L, 20L))
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.table("warmstart_test").as[WarmOut].collect()
      .groupBy(_.user_id).map { case (u, rs) => u -> rs.maxBy(_.rev) }
    // seeded key: snapshot (2, 200) + one arrival of 50
    assert(latest(2L).n_events == 3L && latest(2L).sum_micro == 250L)
    // cold key: stream half only
    assert(latest(3L).n_events == 2L && latest(3L).sum_micro == 30L)
    // snapshot-only key: whether or not the runtime invokes it, any
    // emission must be exactly the seed (the pipeline's coalesce makes
    // the final result independent of this choice either way)
    latest.get(1L).foreach { r =>
      assert(r.n_events == 3L && r.sum_micro == 300L)
    }
  }

  test("streaming Markov transitions: cross-batch state carry, batch-internal (ems, id) order") {
    import graft.streaming.StatefulFeatures.MarkovEventIn
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[MarkovEventIn]
    val q = StatefulFeatures.markovTransitions(in.toDS()).toDF()
      .writeStream.format("memory").queryName("markov_test")
      .outputMode("append").start()
    try {
      // batch 1 ARRIVES out of order; the sorted walk is signup -> view,
      // with the tied-ems pair (2,3) broken by event_id: view then error
      in.addData(
        MarkovEventIn(3, 7, 2000L, "error"),
        MarkovEventIn(2, 7, 2000L, "view"),
        MarkovEventIn(1, 7, 1000L, "signup"))
      q.processAllAvailable()
      // batch 2: click pairs with the CARRIED state (error), not with a
      // batch-local predecessor; a second user contributes nothing yet
      in.addData(
        MarkovEventIn(4, 7, 3000L, "click"),
        MarkovEventIn(5, 8, 1000L, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("markov_test")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got.sorted == Seq(
      ("error", "click"), ("signup", "view"), ("view", "error")))
  }

  test("allowed lateness: within-budget late rows are buffered+reprocessed, beyond-budget dropped") {
    import graft.streaming.StatefulFeatures.EventInTs
    implicit val ctx = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val in = MemoryStream[EventInTs]
    val q = StatefulFeatures.anchoredCountsUpdateExpiring(
        in.toDS().withWatermark("ts", "10 seconds").as[EventInTs],
        retainMs = graft.core.Horizons.H24H + 3600000L)
      .toDF()
      .writeStream.format("memory").queryName("late_w7")
      .outputMode("update").start()
    try {
      // batch 0: two on-time events; watermark after it = 1010s - 10s
      in.addData(EventInTs(1, 7, 1000000L, 1.0, ts(1000)),
                 EventInTs(2, 7, 1010000L, 1.0, ts(1010)))
      q.processAllAvailable()
      // batch 1: e3 is 5 s late but ABOVE the watermark (buffered ->
      // reprocessed: corrects e2 and emits its own exact row); e4 is
      // 100 s late, BELOW it (dropped before the operator runs)
      in.addData(EventInTs(3, 7, 1005000L, 1.0, ts(1005)),
                 EventInTs(4, 7, 900000L, 1.0, ts(900)))
      q.processAllAvailable()
    } finally q.stop()
    val sink = spark.table("late_w7")
    val ids = sink.select($"event_id").distinct().as[Long].collect().toSet
    // the reference's LateEventHandler accounting (watermarks.py:151-208):
    // one buffered (processed late), one dropped
    assert(ids == Set(1L, 2L, 3L), s"dropped/buffered split wrong: $ids")
    // e2 was re-emitted with the late e3 absorbed into its window
    val e2 = sink.filter($"event_id" === 2L)
      .select($"cnt_24h").as[Long].collect().sorted.toSeq
    assert(e2 == Seq(2L, 3L), s"expected correction 2 -> 3 for e2, got $e2")
    // e3's own row sees e1 + itself + nothing newer than its anchor
    val e3 = sink.filter($"event_id" === 3L)
      .select($"cnt_24h").as[Long].collect().toSeq
    assert(e3 == Seq(2L))
  }

  test("chunked replay delivers multiple data micro-batches with a sealing watermark") {
    import graft.streaming.StreamingPipelines
    val sfDir = "/root/testdata/sf0.001"
    val agg = StreamingPipelines.eventStreamReplay(spark, sfDir, nChunks = 4)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours", "3 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream.format("memory").queryName("replay_test")
      .outputMode("append").start()
    val (dataBatches, emittingBatches) =
      try {
        q.processAllAvailable()
        (q.recentProgress.count(_.numInputRows > 0),
         q.recentProgress.count(p => p.sink.numOutputRows > 0))
      } finally q.stop()
    // the property the round-3 verdict asked for: the oracle match is NOT
    // an artifact of whole-dataset-in-one-trigger delivery — data arrives
    // over several micro-batches AND windows seal before the final one
    assert(dataBatches >= 4, s"expected >=4 data micro-batches, saw $dataBatches")
    assert(emittingBatches >= 2,
      s"expected watermark-driven sealing across >=2 batches, saw $emittingBatches")
    // emitted set == the batch oracle's final-watermark frontier
    val events = graft.core.Tables.events(spark, sfDir)
    val maxMs = events.agg(max(unix_millis(col("ts").cast("timestamp"))))
      .head().getLong(0)
    val expected = events
      .select(col("user_id"), unix_millis(col("ts").cast("timestamp")).as("ems"))
      .withColumn("i", explode(array(lit(0), lit(1))))
      .withColumn("win_start_ms",
        (expr("ems div 10800000") - col("i")) * 10800000L)
      .filter(col("win_start_ms") + 21600000L <= maxMs - 3600000L)
      .groupBy(col("user_id"), col("win_start_ms")).count()
      .count()
    assert(spark.table("replay_test").count() == expected)
  }

  test("stream pipelines are state-backend-invariant under RocksDB (100 TB state path)") {
    import graft.streaming.StreamingPipelines
    val sfDir = "/root/testdata/sf0.001"
    val key = "spark.sql.streaming.stateStore.providerClass"
    val rocks =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    def run(): Map[String, Array[String]] = Map(
      // flatMapGroupsWithState + EventTimeTimeout (per-event buffers)
      "anchored" -> StreamingPipelines.anchoredStateful(spark, sfDir)
        .collect().map(_.toString),
      // update-mode retraction + late-row filtering over chunked replay
      "late" -> StreamingPipelines.anchoredLateUpdate(spark, sfDir)
        .collect().map(_.toString),
      // W7 stats member: retraction + late filter + timeout state over the
      // carried-aggregate buffer (exercises state interactions the counts
      // member doesn't: decimal partials, lag anchor, evictedMax)
      "latestats" -> StreamingPipelines.anchoredStatsLateUpdate(spark, sfDir)
        .collect().map(_.toString),
      // W7 session member: re-sessionizing retraction under the tight
      // watermark (merge + prefix-summary state)
      "latesession" -> StreamingPipelines.sessionStepsLateUpdate(spark, sfDir)
        .collect().map(_.toString),
      // windowed-aggregation state sealing across micro-batches
      "aligned" -> StreamingPipelines.alignedWindowAppend(spark, sfDir)
        .collect().map(_.toString),
      // left-outer join state: null emission on watermark proof (r7s3)
      "ivleftjoin" -> StreamingPipelines.intervalLeftJoinStream(spark, sfDir)
        .collect().map(_.toString),
      // dynamic-gap session merge state (r7s3)
      "sessiondyn" -> StreamingPipelines.sessionDynamicStream(spark, sfDir)
        .collect().map(_.toString),
      // chained dropDuplicates -> stateful min agg (r7s3)
      "cumusers" -> StreamingPipelines.cumulativeUsersStream(spark, sfDir)
        .collect().map(_.toString),
      // session-window merge state
      "session" -> StreamingPipelines.sessionWindowAgg(spark, sfDir)
        .collect().map(_.toString),
      // keep-first-per-bucket LSH dedup state (round 6)
      "minhashdedup" -> StreamingPipelines.dedupMinhashStream(spark, sfDir)
        .collect().map(_.toString),
      // O(1)-per-key running EWMA fold (round 7)
      "ewma" -> StreamingPipelines.ewmaStream(spark, sfDir)
        .collect().map(_.toString),
      // greedy cooldown state (round 7)
      "throttle" -> StreamingPipelines.throttleStream(spark, sfDir)
        .collect().map(_.toString),
      // stateless broadcast gate (round 7) — no state store, included to
      // pin that the provider swap cannot perturb a map-only pipeline
      "decontaminate" -> StreamingPipelines.decontaminateStream(spark, sfDir)
        .collect().map(_.toString),
      // keep-min retraction over the hash-shuffled replay (round 7)
      "minhashupdate" -> StreamingPipelines
        .dedupMinhashUpdateStream(spark, sfDir)
        .collect().map(_.toString),
      // broadcast bigram-LM gate (round 7) — map-only like decontaminate
      "lmscore" -> StreamingPipelines.lmScoreStream(spark, sfDir)
        .collect().map(_.toString),
      // last-event pair state feeding a downstream streaming agg (round 7)
      "markov" -> StreamingPipelines.markovStream(spark, sfDir)
        .collect().map(_.toString),
      // open-version SCD2 state, closed rows emitted append-mode (round 7)
      "scd2" -> StreamingPipelines.scd2Stream(spark, sfDir)
        .collect().map(_.toString))
    val default = run()
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, rocks)
    val rocksOut =
      try run()
      finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    default.foreach { case (name, rows) =>
      assert(rocksOut(name).sameElements(rows),
        s"$name diverged under RocksDB state store")
      assert(rows.nonEmpty, s"$name produced no rows")
    }
  }

  test("minhash keep-min retraction genuinely fires under the shuffled replay") {
    import spark.implicits._
    import graft.streaming.{StatefulFeatures, StreamingPipelines}
    val sfDir = "/root/testdata/sf0.001"
    // raw retraction stream (before the latest-rev read-back): a (band,
    // doc) pair emitted more than once means a later smaller id forced a
    // regrade — the case the doc_id-ordered replay makes impossible and
    // this op exists for
    val in = graft.queries.TextAnalysis.lshBandRows(
        StreamingPipelines.docStreamReplay(spark, sfDir, nChunks = 4,
            shuffled = true)
          .select(col("doc_id"), col("text")))
      .as[StatefulFeatures.BandIn]
    val sink = StreamingPipelines.runToMemory(spark,
      StatefulFeatures.bucketMinUpdate(in).toDF(), "update", "minupdspec")
    val regraded = sink.groupBy(col("band_val"), col("doc_id"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    assert(regraded > 0,
      "shuffled replay produced no retractions — disorder not exercised")
  }

  test("W7 family members agree on the survivor set and 24 h window") {
    import graft.streaming.StreamingPipelines
    val sfDir = "/root/testdata/sf0.001"
    // the counts member is the oracle-anchored one; the stats and session
    // members run the SAME disordered replay under the SAME watermark, so
    // their late-row filters must admit exactly the same survivor set,
    // and the stats member's n_24h must equal the counts member's cnt_24h
    // event for event
    val counts = StreamingPipelines.anchoredLateUpdate(spark, sfDir)
      .select(col("event_id"), col("cnt_24h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stats = StreamingPipelines.anchoredStatsLateUpdate(spark, sfDir)
      .select(col("event_id"), col("n_24h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sess = StreamingPipelines.sessionStepsLateUpdate(spark, sfDir)
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(stats == counts, "stats member diverged from counts member")
    assert(sess == counts.keySet, "session member's survivor set diverged")
    val total = graft.core.Tables.events(spark, sfDir).count()
    assert(counts.size < total,
      "late replay dropped nothing — disorder injection inert")
  }

  test("streaming HLL registers merge across batches to the batch sketch") {
    import graft.streaming.SketchState
    import SketchState.HllIn
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[HllIn]
    val q = SketchState.hllRegisters(in.toDS(), 8).toDF()
      .writeStream.format("memory").queryName("hll_test")
      .outputMode("update").start()
    try {
      in.addData(HllIn("a", 0, 3), HllIn("a", 1, 5))
      q.processAllAvailable()
      // batch 2: higher rank in bucket 0 merges in; lower rank is silent
      in.addData(HllIn("a", 0, 7), HllIn("a", 1, 2))
      q.processAllAvailable()
    } finally q.stop()
    val byRev = spark.table("hll_test").collect()
      .map(r => r.getAs[Long]("rev") -> r.getSeq[Int](1)).toMap
    assert(byRev(1L) == Seq(3, 5, 0, 0, 0, 0, 0, 0))
    assert(byRev(2L) == Seq(7, 5, 0, 0, 0, 0, 0, 0)) // max-merge, not last
    assert(byRev.size == 2)
  }

  test("streaming CMS rows add across batches to the batch grid") {
    import graft.streaming.SketchState
    import SketchState.CmsIn
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[CmsIn]
    val q = SketchState.cmsGrid(in.toDS(), 8).toDF()
      .writeStream.format("memory").queryName("cms_test")
      .outputMode("update").start()
    try {
      in.addData(CmsIn(0, 3), CmsIn(0, 3), CmsIn(1, 5))
      q.processAllAvailable()
      // batch 2: same cells again — counts ADD, not replace
      in.addData(CmsIn(0, 3), CmsIn(1, 2))
      q.processAllAvailable()
    } finally q.stop()
    val byKey = spark.table("cms_test").collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[Long]("rev")) -> r.getSeq[Long](1))
      .toMap
    assert(byKey((0, 1L)) == Seq(0L, 0L, 0L, 2L, 0L, 0L, 0L, 0L))
    assert(byKey((0, 2L)) == Seq(0L, 0L, 0L, 3L, 0L, 0L, 0L, 0L))
    assert(byKey((1, 2L)) == Seq(0L, 0L, 1L, 0L, 0L, 1L, 0L, 0L))
  }

  test("streaming dedup: a late earlier event retracts the winner") {
    import StatefulFeatures.DedupIn
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[DedupIn]
    val q = StatefulFeatures.dedupFirstUpdate(in.toDS()).toDF()
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("update").start()
    try {
      in.addData(DedupIn(5, 7, "click", 2000L), DedupIn(6, 7, "view", 1000L))
      q.processAllAvailable()
      // batch 2: a LATE event with smaller ems for (7, click) -> winner
      // change; a larger one for (7, view) -> silent (no emission)
      in.addData(DedupIn(4, 7, "click", 1500L), DedupIn(9, 7, "view", 3000L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("dedup_test").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("rev")) ->
        r.getAs[Long]("event_id")).toMap
    assert(rows(("click", 1L)) == 5L) // initial winner
    assert(rows(("click", 2L)) == 4L) // retracted by the late arrival
    assert(rows(("view", 1L)) == 6L)
    assert(!rows.contains(("view", 2L))) // non-improving arrival is silent
  }

  test("bucket keep-first: cross-batch winners, one verdict per arrival") {
    import StatefulFeatures.{BandIn, BandOut}
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[BandIn]
    val q = StatefulFeatures.bucketFirstUpdate(in.toDS()).toDF()
      .writeStream.format("memory").queryName("bucketfirst_test")
      .outputMode("update").start()
    try {
      in.addData(BandIn("x", 5L), BandIn("x", 7L))
      q.processAllAvailable()
      // batch 2: x's winner is already 5; y is fresh
      in.addData(BandIn("x", 9L), BandIn("y", 9L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("bucketfirst_test").collect()
      .map(r => (r.getAs[String]("band_val"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("winner_id")).toMap
    assert(rows.size == 4) // exactly one verdict per (bucket, doc) arrival
    assert(rows(("x", 5L)) == 5L) // first in its bucket
    assert(rows(("x", 7L)) == 5L) // same-batch loser
    assert(rows(("x", 9L)) == 5L) // cross-batch loser
    assert(rows(("y", 9L)) == 9L) // first in a fresh bucket
  }

  test("update-mode retraction closes the cross-batch tie/late boundary") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[EventIn]
    val q = StatefulFeatures.anchoredCountsUpdate(in.toDS()).toDF()
      .writeStream.format("memory").queryName("upd_test")
      .outputMode("update").start()
    try {
      in.addData(EventIn(1, 7, 1000L, 1.0), EventIn(2, 7, 400000L, 2.0))
      q.processAllAvailable()
      // batch 2: a TIE-mate of event 1 and a LATE event inside event 2's
      // 5m window — both force corrections of already-emitted rows
      in.addData(EventIn(3, 7, 1000L, 3.0), EventIn(4, 7, 300000L, 4.0))
      q.processAllAvailable()
    } finally q.stop()
    // final row per event = the one with max cnt_24h (corrections only
    // ever increase it)
    val fin = spark.table("upd_test").collect()
      .map(r => (r.getAs[Long]("event_id"),
        (r.getAs[Long]("cnt_5m"), r.getAs[Long]("cnt_24h"))))
      .groupBy(_._1).map { case (id, rows) => id -> rows.map(_._2).maxBy(_._2) }
    // RANGE-frame oracle over the full set (5m window = (t-300000, t]):
    //   ev1@1000: ties with ev3 -> 2/2 (corrected from 1/1)
    //   ev3@1000: sees tie-mate ev1 -> 2/2
    //   ev4@300000: 5m window (0, 300000] holds the tie pair -> 3/3
    //   ev2@400000: gains late ev4 within 5m -> 2/4 (corrected from 1/2)
    assert(fin(1L) == (2L, 2L))
    assert(fin(3L) == (2L, 2L))
    assert(fin(4L) == (3L, 3L))
    assert(fin(2L) == (2L, 4L))
  }

  test("update-mode stats retraction: tie and late arrival correct aggregates") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[EventIn]
    val q = StatefulFeatures.anchoredStatsUpdate(in.toDS()).toDF()
      .writeStream.format("memory").queryName("stats_upd_test")
      .outputMode("update").start()
    try {
      in.addData(EventIn(1, 7, 1000L, 2.0), EventIn(2, 7, 121000L, 4.0))
      q.processAllAvailable()
      // tie-mate of ev1 (smaller anchor) + late event between 1 and 2
      in.addData(EventIn(3, 7, 1000L, 6.0), EventIn(4, 7, 61000L, 8.0))
      q.processAllAvailable()
    } finally q.stop()
    val fin = spark.table("stats_upd_test").collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("rev"), r.getAs[Long]("n_24h"),
          r.getAs[Double]("sum_24h"),
          Option(r.getAs[Any]("mins_since_last")).map(_.asInstanceOf[Double])))
      .groupBy(_._1).map { case (id, rows) => id -> rows.map(_._2).maxBy(_._1) }
    // RANGE-frame truth over all four events:
    //   ev1@1000 v2: tie with ev3 -> n2 sum8; lag: tie-mate id 3 > 1 -> None
    assert(fin(1L)._2 == 2L && fin(1L)._3 == 8.0 && fin(1L)._4.isEmpty)
    //   ev3@1000 v6: sees ev1 -> n2 sum8; lag 0 (tie-mate id 1 < 3)
    assert(fin(3L)._2 == 2L && fin(3L)._3 == 8.0 && fin(3L)._4.contains(0.0))
    //   ev4@61000 v8: window holds ev1, ev3 -> n3 sum16; lag 1 min
    assert(fin(4L)._2 == 3L && fin(4L)._3 == 16.0 && fin(4L)._4.contains(1.0))
    //   ev2@121000 v4: gains ev3 AND ev4 -> n4 sum20; lag corrected to 1 min
    assert(fin(2L)._2 == 4L && fin(2L)._3 == 20.0 && fin(2L)._4.contains(1.0))
  }

  test("session retraction: a late event MERGES two sessions and corrects rows") {
    implicit val ctx = spark.sqlContext
    val min = 60000L
    def ev(id: Long, ms: Long, et: String) =
      StatefulFeatures.SessEventIn(id, 7L, ms, et)
    val in = MemoryStream[StatefulFeatures.SessEventIn]
    val q = StatefulFeatures.sessionStepsUpdate(in.toDS()).toDF()
      .writeStream.format("memory").queryName("sess_upd_test")
      .outputMode("update").start()
    try {
      // two sessions 40 min apart
      in.addData(ev(1, 0, "click"), ev(2, 40 * min, "purchase"))
      q.processAllAvailable()
      // late bridge at 20 min: both gaps become 20 min -> ONE session
      in.addData(ev(3, 20 * min, "click"))
      q.processAllAvailable()
    } finally q.stop()
    val fin = spark.table("sess_upd_test").collect()
      .map(r => (r.getAs[Long]("event_id"),
        (r.getAs[Long]("rev"), r.getAs[Long]("session_events"),
          r.getAs[Double]("session_duration_min"),
          r.getAs[Long]("purchases_so_far"), r.getAs[Long]("clicks_so_far"))))
      .groupBy(_._1).map { case (id, rows) => id -> rows.map(_._2).maxBy(_._1) }
    // merged-session truth: ev1 (n1, 0min), ev3 (n2, 20min, 2 clicks),
    // ev2 (n3, 40min from the ORIGINAL session start, 1 purchase)
    assert(fin(1L) == (fin(1L)._1, 1L, 0.0, 0L, 1L))
    assert(fin(3L) == (fin(3L)._1, 2L, 20.0, 0L, 2L))
    assert(fin(2L) == (fin(2L)._1, 3L, 40.0, 1L, 2L))
    // ev2's pre-merge emission said n=1, duration 0 (own session)
    val ev2rows = spark.table("sess_upd_test")
      .filter($"event_id" === 2L).collect()
      .map(r => (r.getAs[Long]("session_events"),
        r.getAs[Double]("session_duration_min"))).toSet
    assert(ev2rows == Set((1L, 0.0), (3L, 40.0)))
  }

  test("session retraction: an older-than-prefix arrival cannot poison the chain") {
    implicit val ctx = spark.sqlContext
    val day = 86400000L
    val min = 60000L
    def ev(id: Long, ms: Long) = StatefulFeatures.SessEventIn(id, 7L, ms, "click")
    val in = MemoryStream[StatefulFeatures.SessEventIn]
    val q = StatefulFeatures.sessionStepsUpdate(in.toDS()).toDF()
      .writeStream.format("memory").queryName("sess_stale_test")
      .outputMode("update").start()
    try {
      // old session, then a jump past the horizon -> old events evicted
      // into the prefix summary
      in.addData(ev(1, 0), ev(2, 10 * min))
      q.processAllAvailable()
      in.addData(ev(3, 2 * day), ev(4, 2 * day + 5 * min))
      q.processAllAvailable()
      // stray arrival INSIDE the summarized (evicted) region: must emit a
      // lone boundary row and must NOT re-emit/reset the retained session
      in.addData(ev(5, 5 * min))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sess_stale_test").collect()
      .map(r => (r.getAs[Long]("event_id"),
        (r.getAs[Long]("rev"), r.getAs[Long]("session_events"),
          r.getAs[Double]("session_duration_min"))))
    val fin = rows.groupBy(_._1)
      .map { case (id, rs) => id -> rs.map(_._2).maxBy(_._1) }
    assert(fin(5L)._2 == 1L && fin(5L)._3 == 0.0) // lone boundary row
    // retained session untouched: ev3/ev4 keep their one correct emission
    assert(rows.count(_._1 == 3L) == 1 && fin(3L)._2 == 1L)
    assert(rows.count(_._1 == 4L) == 1 && fin(4L)._2 == 2L && fin(4L)._3 == 5.0)
  }

  test("EventTimeTimeout evicts idle keys from the state store (W4/W11)") {
    implicit val ctx = spark.sqlContext
    val day = 86400000L
    def ev(id: Long, uid: Long, ms: Long) =
      StatefulFeatures.EventInTs(id, uid, ms, 1.0, new java.sql.Timestamp(ms))
    val in = MemoryStream[StatefulFeatures.EventInTs]
    val ds = in.toDS().withWatermark("ts", "0 seconds")
    val q = StatefulFeatures.anchoredCountsExpiring(ds).toDF()
      .writeStream.format("memory").queryName("evict_test")
      .outputMode("append").start()
    def stateRows: Long = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    try {
      // batch 1: two keys -> two state rows
      in.addData(ev(1, 1, 1000L), ev(2, 2, 1000L))
      q.processAllAvailable()
      assert(stateRows == 2L)
      // batch 2: key 2 advances the watermark past key 1's frontier + 24 h
      // -> key 1's event-time timeout fires (in the trailing no-data
      // micro-batch) and its state row is dropped; key 2 re-armed
      in.addData(ev(3, 2, 2 * day))
      q.processAllAvailable()
      assert(stateRows == 1L)
      // key 1 re-opens with an empty buffer — exactly what the 24 h
      // eviction would have produced anyway (output equivalence)
      in.addData(ev(4, 1, 2 * day + 1000L))
      q.processAllAvailable()
      assert(stateRows == 2L)
    } finally q.stop()
    val cnt = spark.table("evict_test").orderBy($"event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("cnt_24h"))).toMap
    assert(cnt(4) == 1L) // fresh state: sees only itself
    assert(cnt.size == 4) // timeouts emitted nothing
  }

  test("watermark drops events below the watermark (allowed-lateness mapping)") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val agg = in.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 seconds")
      .groupBy(window($"ts", "30 seconds"), $"k")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode("append").start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    try {
      in.addData((t(5), "a"), (t(100), "a")) // wm after batch: 90s
      q.processAllAvailable()
      in.addData((t(6), "a"))                // below wm -> dropped
      in.addData((t(101), "a"))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("wm_test")
      .select(unix_timestamp($"window.start").as("ws"), $"n").collect()
      .map(r => (r.getAs[Long]("ws"), r.getAs[Long]("n"))).toMap
    // window [0,30) sealed with only the first event; late (6,"a") dropped
    assert(emitted(0L) == 1L)
  }

  test("DLQ split routes malformed JSON to the dead-letter branch") {
    val schema = StructType(Seq(StructField("k", LongType)))
    val df = Seq(
      ("""{"k": 1}""", "ok1"),
      ("""not json at all""", "bad1"),
      ("""{"k": 2}""", "ok2"),
      (null: String, "null_payload"),
      ("""{"wrong": true}""", "empty_struct")).toDF("payload", "tag")
    val (valid, dlq) = DlqSplit.split(df, col("payload"), schema)
    val validTags = valid.select($"tag").as[String].collect().toSet
    val dlqTags = dlq.select($"tag").as[String].collect().toSet
    assert(dlqTags == Set("bad1", "null_payload"))
    assert(validTags == Set("ok1", "ok2", "empty_struct"))
    assert(dlq.columns.contains("dlq_reason") && dlq.columns.contains("dlq_payload"))
  }
}

/** observe()-based pipeline metrics (W7/W8) and the FIXTURES.md §7
  * watermark fixture. */
class ObservabilitySpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.Observation
  import org.apache.spark.sql.functions._

  test("event metrics ride the query: totals, late counts, max delay") {
    val obs = Observation()
    // FIXTURES.md §7 fixture: ts offsets with 2s out-of-orderness bound
    val base = 1704067200000L
    val df = Seq(1000L, 2000L, 1500L, 3000L, 500L, 4000L)
      .zipWithIndex.map { case (off, i) => (i.toLong, base + off) }
      .toDF("event_id", "ems")
    // watermark per arrival order: max seen so far - 2000
    val w = org.apache.spark.sql.expressions.Window.orderBy($"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withWm = df.withColumn("wm", max($"ems").over(w) - 2000L)
      .filter($"wm".isNotNull)
    val out = graft.streaming.Observability.withEventMetrics(
      withWm, obs, $"ems", $"wm")
    out.collect()
    val m = obs.get
    assert(m("n_events") == 5L)
    assert(m("n_late").asInstanceOf[Long] >= 1L) // 500-offset event is late
    assert(m("max_delay_ms").asInstanceOf[Long] >= 500L)
  }

  test("score metrics: alert rate at the 0.3 operating threshold") {
    val obs = Observation()
    val df = Seq(0.1, 0.2, 0.5, 0.9).toDF("score")
    graft.streaming.Observability.withScoreMetrics(df, obs, $"score", 0.3)
      .collect()
    val m = obs.get
    assert(m("n_scored") == 4L && m("n_alerts") == 2L)
  }
}

/** Watermarked stream-stream enrichment join (J2): bounded state, interval
  * condition, left-outer emission after watermark passes. */
class StreamJoinSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  test("txn stream enriched with device rows within 60s lookback") {
    implicit val ctx = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val txns = MemoryStream[(String, java.sql.Timestamp, Double)]
    val devs = MemoryStream[(String, java.sql.Timestamp, Boolean)]
    val l = txns.toDF().toDF("device_id", "t_ts", "amount")
      .withWatermark("t_ts", "10 seconds")
    val r = devs.toDF().toDF("device_id", "d_ts", "is_proxy")
      .withWatermark("d_ts", "10 seconds")
    val joined = graft.streaming.StreamJoins.enrichLeft(
      l, r, "device_id", "t_ts", "d_ts", lookbackMs = 60000L)
      .select(col("l.device_id"), col("amount"), col("is_proxy"), col("d_ts"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      devs.addData(("d1", ts(100), true), ("d2", ts(90), false))
      txns.addData(("d1", ts(110), 50.0),   // d1 seen 10s before -> matches
                   ("d3", ts(115), 70.0))   // no device info -> null row
      q.processAllAvailable()
      // advance both watermarks far enough to close the left-outer state
      devs.addData(("dx", ts(400), false))
      txns.addData(("dx", ts(400), 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ssjoin")
      .filter($"amount".isin(50.0, 70.0))
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getBoolean(2)))).toSet
    assert(rows.contains(("d1", 50.0, Some(true))))
    assert(rows.contains(("d3", 70.0, None))) // left-outer null after WM close
  }
}

/** Tie-peer and lag semantics of the full stateful stat op vs the
  * RANGE-frame/LAG batch formulation. */
class StatefulStatsSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.streaming.StatefulFeatures
  import graft.streaming.StatefulFeatures.EventIn

  test("tied timestamps: both peers see each other (RANGE-frame parity)") {
    val in = Seq(
      EventIn(1, 7, 1000L, 10.0),
      EventIn(2, 7, 5000L, 20.0), // tie pair at 5000
      EventIn(3, 7, 5000L, 30.0))
    val rows = StatefulFeatures.anchoredStats(in.toDS())
      .collect().map(r => r.event_id -> r).toMap
    assert(rows(2).n_24h == 3 && rows(3).n_24h == 3) // peers symmetric
    assert(rows(2).sum_24h == 60.0 && rows(3).sum_24h == 60.0)
    // lag: first tie sees the 1000 event; second tie sees its tie-mate
    assert(rows(2).mins_since_last.contains(4000 / 60000.0))
    assert(rows(3).mins_since_last.contains(0.0))
  }

  test("late arrival gets a positive lag from the buffer, not max-seen") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[EventIn]
    val q = StatefulFeatures.anchoredStats(in.toDS()).toDF()
      .writeStream.format("memory").queryName("stats_late")
      .outputMode("append").start()
    try {
      in.addData(EventIn(1, 7, 1000L, 1.0), EventIn(2, 7, 200000L, 2.0))
      q.processAllAvailable()
      in.addData(EventIn(3, 7, 1500L, 3.0)) // late: between 1 and 2
      q.processAllAvailable()
    } finally q.stop()
    val late = spark.table("stats_late").filter($"event_id" === 3).head()
    // predecessor by event time is event 1 (ems 1000), not the max-seen
    assert(late.getAs[Double]("mins_since_last") == 500 / 60000.0)
    assert(late.getAs[Long]("n_24h") == 2) // events 1 and 3 (not 2)
  }

  test("streaming trend slope: moments are arrival-order independent across batches") {
    import graft.streaming.StatefulFeatures.{TrendEventIn, trendSteps}
    implicit val ctx = spark.sqlContext
    val origin = 28401120L * 60000L
    val events = Seq( // minutes 0, 10, 20, 30 with values 1.5, 2.25, 4.0, 3.5
      TrendEventIn(1, 7, origin, 1.5),
      TrendEventIn(2, 7, origin + 600000L, 2.25),
      TrendEventIn(3, 7, origin + 1200000L, 4.0),
      TrendEventIn(4, 7, origin + 1800000L, 3.5))
    def run(name: String, batches: Seq[Seq[TrendEventIn]]): (Long, Long, Long, Long, Long) = {
      val in = MemoryStream[TrendEventIn]
      val q = trendSteps(in.toDS()).toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val last = spark.table(name).orderBy(org.apache.spark.sql.functions
        .col("n").desc).head()
      (last.getAs[Long]("n"), last.getAs[Long]("sx"), last.getAs[Long]("sy"),
        last.getAs[Long]("sxy"), last.getAs[Long]("sxx"))
    }
    val ordered = run("trend_fwd", Seq(events.take(2), events.drop(2)))
    val shuffled = run("trend_rev", Seq(Seq(events(3), events(0)),
      Seq(events(2), events(1))))
    assert(ordered == shuffled) // integer sums commute — order cannot matter
    assert(ordered._1 == 4L && ordered._2 == 60L) // n, Σx = 0+10+20+30
    assert(ordered._3 == 11250000L) // Σy micros
  }
}
