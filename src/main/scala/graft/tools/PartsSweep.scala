package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-6 follow-up to IntervalJoinProbe: the interval join's wall at
  * verify scale is ~per-batch fixed cost, and that cost is
  * O(state partitions) — every micro-batch commits every state store in
  * every partition (×4 stores for a stream-stream join). The knob now
  * threads through `runToMemory` per query, so this sweep measures the
  * REAL sf0.1 pipelines across state partitions in {2, 4, 8},
  * median-of-3 warm, to find the right per-query pin.
  *
  * Round 7 (verdict #7) extends the sweep beyond the interval join to
  * every remaining heavy streaming pipeline: the aligned window pair and
  * the three late-update (W7) pipelines. Select with
  * `SPARK_GRAFT_SWEEP=ivjoin|aligned|alignedappend|lateupdate|
  * latestatsupdate|latesessionupdate|all`.
  * Run: `sbt "runMain graft.tools.PartsSweep"`. Pins recorded in
  * ARCHITECTURE.md (§ state partitions).
  */
object PartsSweep {

  private def timed[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = sys.env.getOrElse("SPARK_GRAFT_SWEEP", "all")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.streaming.StreamingPipelines._
    val pipelines: Seq[(String, String => DataFrame)] = Seq(
      "ivjoin" -> ((p: String) => intervalJoinStream(spark, dir, 8, p)),
      "ivleftjoin" -> ((p: String) => intervalLeftJoinStream(spark, dir, 8, p)),
      "aligned" -> ((p: String) => alignedWindowAgg(spark, dir, p)),
      "alignedappend" -> ((p: String) => alignedWindowAppend(spark, dir, p)),
      "lateupdate" ->
        ((p: String) => anchoredLateUpdate(spark, dir, stateParts = p)),
      "latestatsupdate" ->
        ((p: String) => anchoredStatsLateUpdate(spark, dir, stateParts = p)),
      "latesessionupdate" ->
        ((p: String) => sessionStepsLateUpdate(spark, dir, stateParts = p)),
      // round-8 verdict #7: the worst benched query — re-verify the r7
      // 4-partition pin still holds with the r8 suite shape around it
      "funnel" -> ((p: String) => curationFunnelStream(spark, dir, p)))

    val parts = Seq("2", "4", "8")
    pipelines.filter { case (n, _) => which == "all" || which == n }
      .foreach { case (name, fn) =>
        parts.foreach(p => fn(p).count()) // warm-up (and per-parts plans)
        parts.foreach { p =>
          val ts = (1 to 3).map(_ => timed(fn(p).count())).sorted
          println(f"[psweep] $name%-18s parts=$p%3s median=${ts(1)}%7.2fs " +
            f"(min=${ts.head}%.2f max=${ts.last}%.2f)")
        }
      }

    // Round-13 (verdict r12 #4): chunk-count x state-partition GRID for
    // the interval join — the suite's worst honest streaming cost. The
    // replay chunk count sets the number of micro-batches (each batch
    // commits all four join state stores per partition), so chunks and
    // partitions multiply into the per-run fixed cost; stream_ivfadc
    // _update picked its cadence from a measured sweep and this query
    // deserves the same evidence. Inner-join results are chunk-count
    // invariant (ts-ordered replay: a click is evicted only after the
    // watermark proves no later purchase can need it), so every grid
    // cell answers the same oracle. SPARK_GRAFT_SWEEP=ivgrid.
    // Round-13: replay-chunk sweep for the complete-mode ADDITIVE
    // monitors (chunk-invariant by algebra — commutative sums over the
    // same row multiset; the append-mode state ops are excluded because
    // their within-batch tie reconciliation makes chunking semantic).
    if (which == "monitors") {
      val ms: Seq[(String, Int => DataFrame)] = Seq(
        "seasonality" -> (c => seasonalityStream(spark, dir, c)),
        "winsorize" -> (c => winsorizeStream(spark, dir, c)),
        "abtest" -> (c => abTestStream(spark, dir, c)))
      val chunks = Seq(2, 4, 8)
      for ((_, fn) <- ms; c <- chunks) fn(c).count() // warm + staging
      for ((name, fn) <- ms; c <- chunks) {
        val ts = (1 to 3).map(_ => timed(fn(c).count())).sorted
        println(f"[psweep] monitor:$name%-12s chunks=$c%d " +
          f"median=${ts(1)}%7.2fs (min=${ts.head}%.2f max=${ts.last}%.2f)")
      }
    }

    // Round-14 (verdict r13 #1): replay-chunk sweep for the APPEND-MODE
    // per-key stateful family + watermark window/session members. The
    // r13 monitors-sweep comment excluded these as "chunking semantic" —
    // round 14 closed that: the replay range-partitions on
    // (ts, event_id) and every op sorts its micro-batch by
    // (ems, event_id), so the concatenated fold order is the same
    // global walk at any chunk count (see StatefulReplayChunks doc);
    // the hash gate re-proves it per query. Also includes the migrated
    // bootstrap-CI monitor (commutative complete-mode sums).
    if (which == "statefuls") {
      val ms: Seq[(String, Int => DataFrame)] = Seq(
        "bootstrapci" -> (c => bootstrapCiStream(spark, dir, c)),
        "trendslope" -> (c => trendSlopeStream(spark, dir, c)),
        "alignedappend" ->
          (c => alignedWindowAppend(spark, dir, nChunks = c)),
        "markov" -> (c => markovStream(spark, dir, c)),
        "ewma" -> (c => ewmaStream(spark, dir, c)),
        "brown" -> (c => brownStream(spark, dir, c)),
        "throttle" -> (c => throttleStream(spark, dir, c)),
        "tokenbucket" -> (c => tokenBucketStream(spark, dir, c)),
        "cusum" -> (c => cusumStream(spark, dir, c)),
        "sessionwindow" -> (c => sessionWindowAgg(spark, dir, c)),
        "sessiondyn" -> (c => sessionDynamicStream(spark, dir, c)),
        "scd2" -> (c => scd2Stream(spark, dir, c)))
      val chunks = Seq(2, 4, 8)
      for ((_, fn) <- ms; c <- chunks) fn(c).count() // warm + staging
      for ((name, fn) <- ms; c <- chunks) {
        val ts = (1 to 3).map(_ => timed(fn(c).count())).sorted
        println(f"[psweep] stateful:$name%-14s chunks=$c%d " +
          f"median=${ts(1)}%7.2fs (min=${ts.head}%.2f max=${ts.last}%.2f)")
      }
    }

    // Round-14: replay-chunk sweep for the STATELESS doc-replay gates
    // (broadcast-model verdict per doc — chunk-invariant by construction,
    // the corpus funnel's own nChunks=1 stateless-pass precedent) and the
    // stateful band/doc dedup consumers (keep-first / member-list state —
    // ≥2 batches keep the cross-batch story exercised).
    if (which == "docgates") {
      val ms: Seq[(String, Int => DataFrame)] = Seq(
        "decontaminate" -> (c => decontaminateStream(spark, dir, c)),
        "decontamfuzzy" -> (c => decontaminateFuzzyStream(spark, dir, c)),
        "dsirgate" -> (c => dsirGateStream(spark, dir, c)),
        "ccnetgate" -> (c => ccnetGateStream(spark, dir, c)),
        "lmscore" -> (c => lmScoreStream(spark, dir, c)))
      val chunks = Seq(1, 2, 4)
      for ((_, fn) <- ms; c <- chunks) fn(c).count() // warm + staging
      for ((name, fn) <- ms; c <- chunks) {
        val ts = (1 to 3).map(_ => timed(fn(c).count())).sorted
        println(f"[psweep] gate:$name%-14s chunks=$c%d " +
          f"median=${ts(1)}%7.2fs (min=${ts.head}%.2f max=${ts.last}%.2f)")
      }
    }

    // Round-14: replay-chunk sweep for the W7 allowed-lateness family.
    // NOTE the chunk count is SEMANTIC here (the drop set depends on
    // chunk boundaries) — this grid only measures cost; a pin change
    // must move the oracle's lateSurvivorCtes in lockstep and re-prove
    // exactness + non-degenerate drops/corrections (see LateReplayChunks
    // doc).
    if (which == "lategrid") {
      val ms: Seq[(String, Int => DataFrame)] = Seq(
        "latecounts" -> (c => anchoredLateUpdate(spark, dir, c)),
        "latestats" -> (c => anchoredStatsLateUpdate(spark, dir, c)),
        "latesession" -> (c => sessionStepsLateUpdate(spark, dir, c)))
      val chunks = Seq(4, 8)
      for ((_, fn) <- ms; c <- chunks) fn(c).count() // warm + staging
      for ((name, fn) <- ms; c <- chunks) {
        val ts = (1 to 3).map(_ => timed(fn(c).count())).sorted
        println(f"[psweep] late:$name%-14s chunks=$c%d " +
          f"median=${ts(1)}%7.2fs (min=${ts.head}%.2f max=${ts.last}%.2f)")
      }
    }

    if (which == "bandstate") {
      val ms: Seq[(String, Int => DataFrame)] = Seq(
        "minhashdedup" -> (c => dedupMinhashStream(spark, dir, c)),
        "incdedup" -> (c => dedupIncrementalStream(spark, dir, c)),
        "phashdedup" -> (c => phashDedupStream(spark, dir, c)))
      val chunks = Seq(2, 4)
      for ((_, fn) <- ms; c <- chunks) fn(c).count() // warm + staging
      for ((name, fn) <- ms; c <- chunks) {
        val ts = (1 to 3).map(_ => timed(fn(c).count())).sorted
        println(f"[psweep] band:$name%-14s chunks=$c%d " +
          f"median=${ts(1)}%7.2fs (min=${ts.head}%.2f max=${ts.last}%.2f)")
      }
    }

    if (which == "ivgrid" || which == "ivleftgrid") {
      val fn: (Int, String) => DataFrame =
        if (which == "ivgrid") intervalJoinStream(spark, dir, _, _)
        else intervalLeftJoinStream(spark, dir, _, _)
      val chunks = Seq(2, 4, 8)
      for (c <- chunks; p <- parts)
        fn(c, p).count() // warm (plans + staging)
      for (c <- chunks; p <- parts) {
        val ts = (1 to 3).map(_ => timed(fn(c, p).count())).sorted
        println(f"[psweep] $which%s chunks=$c%d parts=$p%3s " +
          f"median=${ts(1)}%7.2fs (min=${ts.head}%.2f max=${ts.last}%.2f)")
      }
    }
    spark.stop()
  }
}
