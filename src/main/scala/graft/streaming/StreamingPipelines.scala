package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Exact._

/** Structured-Streaming pipelines over the events parquet, driven as REAL
  * streaming queries (file source -> transforms -> memory sink, run to
  * completion synchronously). These back the `stream_*` entries in
  * SparkEntry: the same oracle SQL that checks the batch formulations
  * checks that the streaming execution produces identical results —
  * offline/online parity, the property the reference's feature store cares
  * about most (feast/feature_utils.py:170-232).
  *
  * Streaming semantics (SURVEY.md §2.4): W1 aligned sliding windows via
  * `window()`, W5 session windows via `session_window`, W3 per-event
  * stateful emission via flatMapGroupsWithState, W6 watermarks. In
  * production these run continuously against Kafka with checkpoints; the
  * memory sink + processAllAvailable form is the test/verify harness.
  */
object StreamingPipelines {

  private val nameCounter = new AtomicLong(0)
  private def freshName(prefix: String): String =
    s"${prefix}_${nameCounter.incrementAndGet()}"

  /** Per-process token in every replay stage path: two JVMs sharing
    * java.io.tmpdir (Bench while Verify runs) must never contend on one
    * stage dir — a freshness miss in one would delete and rewrite the
    * directory while the other's file-source stream is mid-read. */
  private val procToken = ProcessHandle.current().pid().toString

  /** Root for verification-ephemeral streaming checkpoints: tmpfs when the
    * host has one (/dev/shm — no fsync-to-disk on the per-micro-batch
    * offset/commit/state-delta writes, so a loaded writeback queue cannot
    * stall micro-batch commits), else the process tmpdir. Per-process dir,
    * deleted per query in [[runToMemory]]. */
  private lazy val ckptRoot: java.nio.file.Path = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isDirectory(shm) &&
          java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val d = base.resolve(s"graft_ckpt_p$procToken")
    java.nio.file.Files.createDirectories(d)
    d.toFile.deleteOnExit()
    d
  }

  /** Streaming read of the events parquet: same normalization as
    * Tables.events (nanos -> microsecond timestamps, via the SHARED
    * Tables.normalizeEventTs so the paths cannot diverge). The file source
    * wants a directory; stage a symlink dir under java.io.tmpdir (a real
    * deployment points this at the landing directory / Kafka topic). */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val src = Paths.get(path)
    // full sanitized path as the key (a 32-bit hash could collide)
    val stage = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stream_" + path.replaceAll("[^A-Za-z0-9]", "_"))
    Files.createDirectories(stage)
    val link = stage.resolve("events.parquet")
    // refresh when the source changed (matters for the copy fallback: a
    // stale copy would silently stream old bytes after regeneration)
    val stale = Files.exists(link) && !Files.isSymbolicLink(link) &&
      (Files.size(link) != Files.size(src) ||
       Files.getLastModifiedTime(link) != Files.getLastModifiedTime(src))
    if (stale) Files.delete(link)
    if (!Files.exists(link)) {
      try Files.createSymbolicLink(link, src)
      catch { case _: Exception =>
        Files.copy(src, link, StandardCopyOption.COPY_ATTRIBUTES)
      }
    }
    val schema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(schema).parquet(stage.toString)
    graft.core.Tables.normalizeEventTs(raw)
      .withColumn("ems", unix_millis(col("ts").cast("timestamp")))
  }

  /** Multi-micro-batch replay staging: the events table split into
    * `nChunks` parquet files in EVENT-TIME order (range-partitioned on
    * (ts, event_id)) with strictly increasing modification times, read
    * back with `maxFilesPerTrigger=1` — so a query consumes the dataset
    * as N micro-batches with a genuinely MONOTONE watermark advancing
    * between them (ref streaming/core/utils/watermarks.py:67-105), the
    * Kafka-log replay shape (a partitioned log replays in append ≈
    * event-time order; the driver's events table is exactly time-ordered
    * in row order at every SF, measured lateness 0 ms).
    *
    * This is what lets the append-mode window/join pipelines seal
    * windows watermark-driven across batches instead of relying on
    * whole-dataset-in-one-trigger delivery: each batch's rows are at or
    * above the watermark (previous batches' max - delay), so nothing is
    * late-dropped, windows/joins seal as the watermark passes them, and
    * the final emitted set equals the batch oracle's explicit
    * final-watermark condition regardless of the chunk count. */
  def eventStreamReplay(spark: SparkSession, dir: String,
                        nChunks: Int = 8): DataFrame = {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import java.nio.charset.StandardCharsets
    import scala.jdk.CollectionConverters._
    val path = s"$dir/events.parquet"
    val src = Paths.get(path)
    val stage = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_replay_" + path.replaceAll("[^A-Za-z0-9]", "_") +
        s"_${nChunks}_p$procToken")
    val marker = stage.resolve("_staged")
    // the sig carries a staging-format version: a format change must not
    // silently reuse a stale staged dir from an earlier build
    val sig =
      s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}:v2"
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), StandardCharsets.UTF_8) == sig
    if (!fresh) {
      if (Files.exists(stage)) {
        val walk = Files.walk(stage)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
        finally walk.close()
      }
      graft.core.Tables.events(spark, dir)
        .repartitionByRange(nChunks, col("ts"), col("event_id"))
        .sortWithinPartitions(col("ts"), col("event_id"))
        .write.mode("overwrite").parquet(stage.toString)
      // strictly increasing mtimes in partition (= event-time) order so
      // the file source's oldest-first pickup replays chronologically
      val listing = Files.list(stage)
      val parts =
        try listing.iterator().asScala
          .filter(_.getFileName.toString.startsWith("part-")).toSeq
          .sortBy(_.getFileName.toString)
        finally listing.close()
      val t0 = Files.getLastModifiedTime(src).toMillis
      parts.zipWithIndex.foreach { case (p, i) =>
        Files.setLastModifiedTime(p, FileTime.fromMillis(t0 + i * 1000L))
      }
      Files.write(marker, sig.getBytes(StandardCharsets.UTF_8))
    }
    val schema = spark.read.parquet(stage.toString).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString)
      .withColumn("ems", unix_millis(col("ts").cast("timestamp")))
  }

  /** Allowed-lateness budget of the W7 pipeline (the reference's
    * `allowed_lateness_ms`, watermarks.py:151-208) and the deterministic
    * arrival-delay injection that exercises it: the events corpus is
    * perfectly time-ordered, so lateness has to be INJECTED — each
    * event's arrival position is its event time plus an md5-derived
    * delay (10% of events 10 min late: inside the budget, buffered +
    * reprocessed; 10% 40 min late: beyond it, dropped once the watermark
    * has advanced past them). md5 arithmetic keeps the disorder an exact
    * pure function of the data, reproducible by the DuckDB oracle. */
  private val LateBudgetMs = 900000L    // 15 min watermark delay
  private val LateSmallMs = 600000L     // 10 min -> buffered + reprocessed
  // 8 days: > two chunk spans of the 30-day corpus, so these rows land
  // below even the lag-2 (previous-batch) watermark and are dropped;
  // smaller delays never cross two batch boundaries and always survive
  private val LateBigMs = 691200000L

  /** Disordered replay staging for the allowed-lateness pipeline: events
    * sorted by (arrival, event_id) and split into `nChunks` files of
    * equal ARRIVAL-rank ranges (chunk = rank*n/total — explicitly
    * computable, so the oracle can reproduce the batch boundaries), with
    * ascending mtimes for chronological pickup. Event time is rebuilt as
    * timestamp_millis(ems) so the watermark arithmetic is exact
    * millisecond math on both engines. The global row_number here is a
    * one-time staging sort of the replay log, not a query-path operator
    * (a 100 TB backfill stages with a range partitioner + per-partition
    * offsets instead). */
  def lateReplayStream(spark: SparkSession, dir: String,
                       nChunks: Int = 8): DataFrame = {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import java.nio.charset.StandardCharsets
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.expressions.Window
    val path = s"$dir/events.parquet"
    val src = Paths.get(path)
    val stage = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_late_" + path.replaceAll("[^A-Za-z0-9]", "_") +
        s"_${nChunks}_p$procToken")
    val marker = stage.resolve("_staged")
    // the sig carries a staging-format version: a schema change must not
    // silently reuse a stale staged dir from an earlier build
    val sig =
      s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}:v2"
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), StandardCharsets.UTF_8) == sig
    if (!fresh) {
      if (Files.exists(stage)) {
        val walk = Files.walk(stage)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
        finally walk.close()
      }
      val ev = graft.core.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"),
          epochMs(col("ts")).as("ems"), col("value"), col("event_type"))
        .withColumn("hm",
          pmod(conv(substring(md5(col("event_id").cast("string")
            .cast("binary")), 1, 8), 16, 10).cast("long"), lit(10L)))
        .withColumn("arrival",
          col("ems") + when(col("hm") === 7L, LateSmallMs)
            .when(col("hm") === 3L, LateBigMs).otherwise(0L))
      val total = ev.count()
      val staged = ev
        .withColumn("rn",
          row_number().over(Window.orderBy(col("arrival"), col("event_id")))
            .cast("long") - 1L)
        .withColumn("chunk",
          expr(s"cast(rn * $nChunks div $total as int)"))
        .withColumn("ts", timestamp_millis(col("ems")))
        .select(col("event_id"), col("user_id"), col("ems"), col("value"),
          col("event_type"), col("ts"), col("chunk"))
      val build = stage.resolve("_build")
      staged.repartition(nChunks, col("chunk"))
        .sortWithinPartitions(col("ems"), col("event_id"))
        .write.mode("overwrite").partitionBy("chunk").parquet(build.toString)
      val t0 = Files.getLastModifiedTime(src).toMillis
      (0 until nChunks).foreach { i =>
        val cdir = build.resolve(s"chunk=$i")
        val listing = Files.list(cdir)
        val parts =
          try listing.iterator().asScala
            .filter(_.getFileName.toString.startsWith("part-")).toSeq
          finally listing.close()
        require(parts.size == 1, s"chunk $i: expected 1 file, got ${parts.size}")
        val dst = stage.resolve(f"c$i%04d.parquet")
        Files.move(parts.head, dst)
        Files.setLastModifiedTime(dst, FileTime.fromMillis(t0 + i * 1000L))
      }
      val walk = Files.walk(build)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
      finally walk.close()
      Files.write(marker, sig.getBytes(StandardCharsets.UTF_8))
    }
    val schema = spark.read.parquet(stage.toString).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString)
  }

  /** W7 TRUE allowed-lateness over the disordered replay: update-mode
    * anchored counts under a 15 min watermark — within-budget late rows
    * re-emit corrected anchors (buffered/reprocessed), beyond-budget rows
    * are dropped by the operator's late-row filter. The oracle recomputes
    * the drop set from the explicit chunk rule (watermark before chunk c
    * = max event time of chunks < c, minus the budget; a row is dropped
    * iff its ems is strictly below it) and runs the RANGE-frame counts
    * over the SURVIVORS — so both the correction math and the drop
    * boundary are checked exactly. */
  def anchoredLateUpdate(spark: SparkSession, dir: String,
      nChunks: Int = LateReplayChunks,
      stateParts: String = LateUpdateParts): DataFrame = {
    import spark.implicits._
    val in = lateReplayStream(spark, dir, nChunks)
      .withWatermark("ts", s"$LateBudgetMs milliseconds")
      .select(col("event_id"), col("user_id"), col("ems"), col("value"),
        col("ts"))
      .as[StatefulFeatures.EventInTs]
    // state = window + max injected lateness (survivors can be displaced
    // by up to LateBigMs when the watermark lagged), so corrections stay
    // exact; idle eviction defaults to retain + 24 h on top
    val out = StatefulFeatures.anchoredCountsUpdateExpiring(in,
      retainMs = graft.core.Horizons.H24H + LateBigMs).toDF()
    val sink = runToMemory(spark, out, "update", "lateupdate", stateParts)
    latestBy(sink, "cnt_24h", "event_id").orderBy(col("event_id"))
  }

  /** The stats member of the W7 family: full anchored stats with
    * retraction under the tight watermark, over the same disordered
    * replay — same survivor set, stats oracle over it. */
  def anchoredStatsLateUpdate(spark: SparkSession, dir: String,
      nChunks: Int = LateReplayChunks,
      stateParts: String = LateUpdateParts): DataFrame = {
    import spark.implicits._
    val in = lateReplayStream(spark, dir, nChunks)
      .withWatermark("ts", s"$LateBudgetMs milliseconds")
      .select(col("event_id"), col("user_id"), col("ems"), col("value"),
        col("ts"))
      .as[StatefulFeatures.EventInTs]
    val out = StatefulFeatures.anchoredStatsUpdateExpiring(in,
      retainMs = graft.core.Horizons.H24H + LateBigMs).toDF()
    val sink = runToMemory(spark, out, "update", "latestatsupdate", stateParts)
    latestBy(sink, "rev", "event_id").drop("rev").orderBy(col("event_id"))
  }

  /** The session member of the W7 family: re-sessionizing retraction
    * under the tight watermark — a within-budget late event can MERGE
    * sessions whose rows were already output; beyond-budget events drop. */
  def sessionStepsLateUpdate(spark: SparkSession, dir: String,
      nChunks: Int = LateReplayChunks,
      stateParts: String = StatePartitions): DataFrame = {
    import spark.implicits._
    val in = lateReplayStream(spark, dir, nChunks)
      .withWatermark("ts", s"$LateBudgetMs milliseconds")
      .select(col("event_id"), col("user_id"), col("ems"), col("event_type"),
        col("ts"))
      .as[StatefulFeatures.SessEventInTs]
    val out = StatefulFeatures.sessionStepsUpdateExpiring(in,
      retainMs = graft.core.Horizons.H24H + LateBigMs).toDF()
    val sink = runToMemory(spark, out, "update", "latesessionupdate", stateParts)
    latestBy(sink, "rev", "event_id").drop("rev").orderBy(col("event_id"))
  }

  /** Round-14 (guide §2.5 "input skew"): spread a replay micro-batch
    * across the session's cores before heavy per-row stateless compute.
    * A micro-batch reads ONE staged file = ONE input partition, so
    * md5-chain / HOF / broadcast-model projections otherwise run
    * single-core per batch (measured on the funnel's stateless gates:
    * the same column set costs ~0.5 s batch-parallel vs ~4 s in-stream).
    * Hash-partitions on a deterministic key column — safe under task
    * retry, and semantics-free: downstream state ops reshuffle by their
    * own key, stateless append sinks feed order-independent finales.
    * Width = the session's core count, never a constant. */
  private[graft] def spread(df: DataFrame, key: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))

  private val lastSink = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Read-back of an update-mode sink: the winning row per key by
    * `orderCol` DESC — what an upsert sink keyed on `keys` stores
    * last-write-wins. One definition for every retraction pipeline. */
  private def latestBy(sink: DataFrame, orderCol: String,
                       keys: String*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).desc)
    sink.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Runs a streaming DataFrame to completion into a memory sink and
    * returns the sink table. The previous sink table of the same caller is
    * dropped so repeated invocations (warm-up + timed bench runs) hold at
    * most one result copy in driver memory.
    *
    * NOT REENTRANT: the session-global shuffle-partition conf is pinned
    * for the duration of the run (Spark reads it once, at the first
    * batch's planning — there is no per-query override for the state
    * partition count) and restored afterwards. Callers are single-query-
    * at-a-time by contract: Verify/Bench/the probes all run streaming
    * queries strictly sequentially on this session. A concurrent batch
    * query on the same session could observe the pinned value. */
  /** Physical plan of the most recent runToMemory micro-batch — test
    * observability only (PlanPinSpec's stream-static join pins). */
  @volatile private[graft] var lastExecutedPlan: Option[String] = None

  def runToMemory(spark: SparkSession, out: DataFrame, mode: String,
                  caller: String = "query",
                  stateParts: String = StatePartitions): DataFrame = {
    val name = freshName(s"graft_sink_$caller")
    // shuffle partitions = state partitions for the query being started
    // (frozen at checkpoint creation — and read during the FIRST batch's
    // planning, which runs async after start(), so the conf stays set
    // until the run completes); sized to the verify workload by default
    // (see StatePartitions); `stateParts` is the capacity knob a larger
    // corpus sizes up (exercised by IntervalJoin100x)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", stateParts)
    // Ephemeral checkpoint on tmpfs (round-10, driver-bench robustness):
    // every micro-batch commits the offset log, the commit log, and one
    // state delta per store per partition — each an fsync when the
    // checkpoint sits on the disk-backed default tmpdir. Under an idle
    // disk those fsyncs are sub-ms (the builder's standalone benches),
    // but under the driver's back-to-back Verify + DuckDB-oracle + Bench
    // sequence the dirty-page writeback queue turns them into the
    // 3-8x per-micro-batch stalls BENCH_r09 measured on exactly the
    // chunked-replay pipelines (8 batches x stores x partitions). These
    // checkpoints are verification-ephemeral (deleted on stop); a
    // production deployment points this at durable storage and sizes the
    // commit cost explicitly (ARCHITECTURE.md "streaming fixed costs").
    // graft.ckpt.base system property: measurement override for the
    // durable-checkpoint cost table (ARCHITECTURE.md) — lets ScaleCheck
    // re-run the same stateful query against /dev/shm vs a disk-backed
    // dir vs an fsync-contended disk without touching the default.
    val ckptBase = sys.props.get("graft.ckpt.base")
      .map { p =>
        val d = java.nio.file.Paths.get(p)
        java.nio.file.Files.createDirectories(d); d
      }.getOrElse(ckptRoot)
    val ckpt = java.nio.file.Files.createTempDirectory(ckptBase, name)
    try {
      val q = out.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt.toString)
        .outputMode(mode).start()
      try {
        q.processAllAvailable()
        // expose the last micro-batch's PHYSICAL plan so PlanPinSpec can
        // pin stream-static join strategies (broadcast, not shuffle) —
        // a Spark upgrade must not silently regress a plan the bench
        // would only catch as a timing blip (round-11, verdict r10 #8)
        lastExecutedPlan = q match {
          case w: org.apache.spark.sql.execution.streaming.runtime
              .StreamingQueryWrapper =>
            Option(w.streamingQuery.lastExecution).map(_.executedPlan.toString)
          case _ => None
        }
      } finally q.stop()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(ckpt)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists _)
      catch { case _: Exception => () } // best-effort cleanup
      finally walk.close()
    }
    Option(lastSink.put(caller, name))
      .foreach(prev => spark.catalog.dropTempView(prev))
    spark.table(name)
  }

  /** W1: aligned sliding-window aggregation (6 h / 3 h) as a streaming
    * query, complete mode (all windows emitted on completion). */
  def alignedWindowAgg(spark: SparkSession, dir: String,
      stateParts: String = StatePartitions): DataFrame = {
    val agg = eventStream(spark, dir)
      .groupBy(window(col("ts").cast("timestamp"), "6 hours", "3 hours"),
               col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), unix_millis(col("window.start")).as("win_start_ms"),
              col("n_events"), col("sum_value"))
    runToMemory(spark, agg, "complete", "aligned", stateParts)
      .orderBy(col("user_id"), col("win_start_ms"))
  }

  /** W1 + W6 in PRODUCTION form: the aligned sliding window in append
    * mode under a 1 h watermark — a window row is emitted exactly once,
    * when the watermark passes its end (no complete-mode re-emission, no
    * driver-side window table). Runs over the CHUNKED replay
    * (eventStreamReplay, maxFilesPerTrigger=1), so windows genuinely seal
    * batch-by-batch as the monotone watermark passes them; the oracle
    * mirrors only the final frontier: windows with
    * end <= max event time - 1 h. */
  def alignedWindowAppend(spark: SparkSession, dir: String,
      stateParts: String = LateUpdateParts,
      nChunks: Int = StatefulReplayChunks): DataFrame = {
    val agg = eventStreamReplay(spark, dir, nChunks)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours", "3 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), unix_millis(col("window.start")).as("win_start_ms"),
              col("n_events"), col("sum_value"))
    runToMemory(spark, agg, "append", "alignedappend", stateParts)
      .orderBy(col("user_id"), col("win_start_ms"))
  }

  /** W5, dynamic-gap form: Spark's session_window with a PER-EVENT gap
    * expression (clicks keep sessions alive 30 min, everything else
    * 10 min) as a streaming query — append mode over the chunked replay
    * under a 1 h watermark, sessions merging across micro-batches in
    * state and emitted once sealed. Same frontier oracle rule as the
    * fixed-gap stream, in the µs domain (the merge decision happens at
    * full timestamp precision). */
  def sessionDynamicStream(spark: SparkSession, dir: String,
      nChunks: Int = StatefulReplayChunks): DataFrame = {
    val agg = eventStreamReplay(spark, dir, nChunks)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"),
        graft.queries.FeatureOps.dynamicGapCol), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"), col("sum_value"))
    runToMemory(spark, agg, "append", "sessiondyn")
      .orderBy(col("user_id"), col("start_us"))
  }

  /** J2 as a REAL stream-stream join: purchases x clicks inner-joined on
    * user with the [-1 h, 0) event-time interval condition, both sides
    * watermarked (Spark evicts right state once the watermark passes the
    * interval — bounded join state). Runs over the CHUNKED replay, so
    * click state is genuinely built up AND evicted across micro-batches:
    * a purchase in batch N finds its clicks still in state because the
    * log-ordered replay keeps the watermark at most 1 h + one batch
    * behind any unjoined purchase's interval. Matches emit eagerly
    * (inner join), so the sink holds the complete pair set; the
    * left-outer count rollup runs as a batch over the sink + the static
    * purchase list, giving the SAME oracle as the batch interval join. */
  /** State partitions for the streaming pipelines: a stateful query's
    * partition count is frozen at checkpoint creation and AQE cannot
    * touch it, so it must be SIZED, not defaulted — every micro-batch
    * commits every state store in every partition (a stream-stream join
    * carries FOUR per partition), an O(partitions x batches) fixed cost
    * that dwarfs per-row work at verify scale (measured: 32 partitions
    * ~= 2x the wall of 8 on the sf0.1 interval join). 8 partitions carry
    * ~12k rows each here; a production deployment sizes this to
    * target-throughput/executor instead (state ops shuffle on the entity
    * key — the partition count is a capacity knob, not a semantics
    * knob). Applied in [[runToMemory]], the single chokepoint every
    * streaming query starts through. */
  private val StatePartitions = "8"

  /** Interval-join pin: 2 chunks × 2 state partitions (round 13,
    * verdict r12 #4 — the full chunk-count × partition GRID, PartsSweep
    * `ivgrid`, median-of-3 warm at sf0.1, table in ARCHITECTURE.md):
    * per-batch fixed cost is (batches × partitions × 4 state stores),
    * so the two knobs MULTIPLY — the old 8-chunk/4-part pin measured
    * 7.53 s, 2×2 measures 3.00 s. Two chunks still exercise the
    * cross-batch boundary (batch-2 purchases join batch-1 clicks held
    * in state — the same measured-cadence choice stream_ivfadc_update
    * made), and inner-join results are chunk-invariant: the ts-ordered
    * replay evicts a click only after the watermark proves no later
    * purchase can need it. At 100× data the knobs turn the other way
    * (IntervalJoin100x: 32 parts beats 8 once per-row work dominates)
    * — this is the verify-scale pin, not a constant. */
  private val IntervalJoinParts = "2"
  private[graft] val IntervalJoinChunks = 2

  /** Round-7 sweep of the remaining heavy streams (PartsSweep over
    * {2,4,8}, median-of-3 warm, sf0.1 — full table in ARCHITECTURE.md):
    * the chunked-replay append window and the counts/stats late-update
    * pipelines all land best at 4 (8 costs +6% to +68%, worst on the
    * stats member whose per-batch commit carries the aggregate buffers);
    * the session late-update and the single-trigger complete-mode window
    * measured FLAT-to-best at 8 and keep the global default — a pin is
    * only honest where the sweep actually moved. */
  private[graft] val LateUpdateParts = "4"

  /** Replay cadence of the W7 allowed-lateness family. UNLIKE the other
    * cadence pins, this one is SEMANTIC: the drop set depends on the
    * chunk boundaries (the late-row filter's watermark is derived from
    * prior chunks' max event time), so the oracle's survivor CTE mirrors
    * this constant (`StreamingQueries.lateSurvivorCtes` reads it) and
    * the two sides must move together. Both halves of the
    * LateEventHandler contract stay NON-DEGENERATE at 4 (measured in
    * DuckDB over the mirrored CTE): drops 39 and cross-batch admitted
    * late rows 735 at sf0.01 (1 / 62 at sf0.001) vs 772 / 145 at 8 —
    * fewer chunks move the balance from drops toward buffered-reprocess
    * corrections (the watermark lags two LARGER chunks), but both code
    * paths run at every SF; StreamingSpec asserts drops > 0 and the
    * three members' survivor-set agreement. Round-14 sweep
    * (PartsSweep `lategrid`, {4,8}, median-of-3 warm at sf0.1): 4 wins
    * every member — counts 6.49 vs 9.85, stats 9.23 vs 10.49, session
    * 6.70 vs 12.98 — the 8-chunk form pays 4 more per-batch state
    * commits for no additional code path (every batch already crosses
    * the late-filter, correction and eviction paths at 4). */
  private[graft] val LateReplayChunks = 4

  def intervalJoinStream(spark: SparkSession, dir: String,
                         nChunks: Int = IntervalJoinChunks,
                         stateParts: String = IntervalJoinParts): DataFrame = {
    val es = eventStreamReplay(spark, dir, nChunks)
      .withColumn("ts", col("ts").cast("timestamp"))
    val purchases = es.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = es.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"))
      .select(col("purchase_id"))
    val matches = runToMemory(spark, joined, "append", "ivjoin", stateParts)
    val counts = matches.groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n"))
    graft.core.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        epochMs(col("ts")).as("ts_ms"))
      .join(counts, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"), col("ts_ms"),
        coalesce(col("n"), lit(0L)).as("clicks_prev_1h"))
      .orderBy(col("purchase_id"))
  }

  /** J2, OUTER form: the purchases × clicks interval join as a TRUE
    * LEFT OUTER stream-stream join — Spark holds an unmatched purchase in
    * join state and emits its null-padded row only when the watermark
    * PROVES no further click can match (c_ts < p_ts ⇒ provable once the
    * watermark passes p_ts); matches still emit eagerly. This is the
    * semantics the inner-join pipeline reconstructs with a batch rollup —
    * here the null emission is the ENGINE's, so the sink alone carries
    * the left-outer answer. Trailing purchases inside the final
    * watermark's horizon are still pending in state at shutdown (emitted
    * nothing), so the oracle mirrors the frontier exactly like the
    * session-window oracle does: unmatched purchases appear iff
    * p_ts ≤ global max event time − 1 h. Same state-partition pin and
    * bounded-state story as [[intervalJoinStream]]. */
  /** Left-join pin: 2 chunks × 2 state partitions (round-13 `ivleftgrid`
    * sweep, median-of-3 warm at sf0.1, table in ARCHITECTURE.md: 2×2 =
    * 4.17 s vs the old 8×2 = 8.52 s — the outer join pays the inner
    * join's per-batch commit cost PLUS a per-partition eviction scan
    * for the null emissions, so the chunk knob is even steeper). The
    * left-outer frontier semantics are chunk-invariant: the oracle's
    * cutoff is global-max-event-time − 1 h, reached at the last batch
    * regardless of how the replay is chunked. Same reversal at scale as
    * the inner join (IntervalJoin100x) — a verify-scale pin. */
  private val IntervalLeftJoinParts = "2"

  def intervalLeftJoinStream(spark: SparkSession, dir: String,
                             nChunks: Int = IntervalJoinChunks,
                             stateParts: String = IntervalLeftJoinParts): DataFrame = {
    val es = eventStreamReplay(spark, dir, nChunks)
      .withColumn("ts", col("ts").cast("timestamp"))
    val purchases = es.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = es.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"),
      "leftOuter")
      .select(col("purchase_id"), col("p_user"), col("p_ts"), col("c_ts"))
    val sink = runToMemory(spark, joined, "append", "ivleftjoin", stateParts)
    sink.groupBy(col("purchase_id"))
      .agg(max(col("p_user")).as("user_id"),
        unix_millis(max(col("p_ts"))).as("ts_ms"),
        count(col("c_ts")).as("clicks_prev_1h"))
      .orderBy(col("purchase_id"))
  }

  /** W5 + W6: session windows (30 min gap) with a 1 h watermark, append
    * mode over the CHUNKED replay — sessions merge across micro-batches
    * in state and are emitted exactly once, when the monotone watermark
    * seals them; the oracle mirrors only the final frontier (last event
    * + gap <= global max - 1 h). */
  def sessionWindowAgg(spark: SparkSession, dir: String,
      nChunks: Int = StatefulReplayChunks): DataFrame = {
    val agg = eventStreamReplay(spark, dir, nChunks)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(when(col("event_type") === "purchase", 1).otherwise(0))
             .as("purchases"),
           dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        col("n_events"), col("purchases"), col("sum_value"))
    runToMemory(spark, agg, "append", "session")
      .orderBy(col("user_id"), col("session_start_ms"))
  }

  /** W3: event-anchored per-event stateful emission via
    * flatMapGroupsWithState (StatefulFeatures.anchoredCounts) as a
    * streaming query. Oracle = the same RANGE-frame SQL as the batch
    * anchored query: streaming state machine == declarative window. */
  def anchoredStateful(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = watermarkedEvents(spark, dir)
    val out = StatefulFeatures.anchoredCountsExpiring(in).toDF()
    runToMemory(spark, out, "append", "anchored").orderBy(col("event_id"))
  }

  /** W3 via Spark 4 `transformWithState`: the same anchored counts
    * operator on the NEW arbitrary-stateful API — named ValueState +
    * explicit event-time timers on a StatefulProcessorHandle
    * ([[AnchoredCountsProcessor]]), sharing countsCore with the
    * flatMapGroupsWithState form so the two state APIs are provably the
    * same operator (same oracle row set). transformWithState requires the
    * RocksDB provider; pinned for the query and restored after — the same
    * single-query-at-a-time contract runToMemory already documents. */
  private def anchoredTwsWith(spark: SparkSession, dir: String,
      proc: org.apache.spark.sql.streaming.StatefulProcessor[
        Long, StatefulFeatures.EventInTs, StatefulFeatures.AnchoredCounts],
      caller: String): DataFrame = {
    import spark.implicits._
    val in = watermarkedEvents(spark, dir)
    implicit val outEnc =
      org.apache.spark.sql.Encoders.product[StatefulFeatures.AnchoredCounts]
    val out = in.groupByKey(_.user_id)(
        org.apache.spark.sql.Encoders.scalaLong)
      .transformWithState(proc,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append(), outEnc)
      .toDF()
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try runToMemory(spark, out, "append", caller)
      .orderBy(col("event_id"))
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  def anchoredTws(spark: SparkSession, dir: String): DataFrame =
    anchoredTwsWith(spark, dir, new AnchoredCountsProcessor(), "anchoredtws")

  /** ListState showcase: per-event trailing ≤5 event-type window per user
    * (see [[RecentTypesProcessor]] — pure-append hot path, log compaction
    * on overflow, NO eviction timer because the trailing window never
    * expires semantically). Same RocksDB pin as the other tws ops. */
  def recentTypes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import RecentTypesProcessor.{RecentTypes, TypedEventIn}
    val in = eventStream(spark, dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(col("event_id"), col("user_id"), col("ems"), col("event_type"),
        col("ts"))
      .as[TypedEventIn]
      .withWatermark("ts", ReplayDelay)
    implicit val outEnc = org.apache.spark.sql.Encoders.product[RecentTypes]
    val out = in.groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .transformWithState(new RecentTypesProcessor(),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append(), outEnc)
      .toDF()
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try runToMemory(spark, out, "append", "recenttypes")
      .orderBy(col("event_id"))
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  /** The MapState layout of the tws operator (minute → timestamps as a
    * per-key map; granular point writes instead of whole-buffer
    * rewrites — see [[AnchoredCountsMapProcessor]]). */
  def anchoredTwsMap(spark: SparkSession, dir: String): DataFrame =
    anchoredTwsWith(spark, dir, new AnchoredCountsMapProcessor(),
      "anchoredtwsmap")

  /** W3 with RETRACTION: update-mode per-event counts
    * (StatefulFeatures.anchoredCountsUpdate) — late/tied arrivals re-emit
    * corrected rows for already-output events, so cross-batch disorder
    * converges to the RANGE-frame oracle. The sink keeps every emission;
    * read-back takes the final row per event (max cnt_24h — corrections
    * only grow it), which is what an upsert sink stores last-write-wins. */
  def anchoredUpdateStateful(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = eventStream(spark, dir)
      .select(col("event_id"), col("user_id"), col("ems"), col("value"))
      .as[StatefulFeatures.EventIn]
    val out = StatefulFeatures.anchoredCountsUpdate(in).toDF()
    val sink = runToMemory(spark, out, "update", "anchoredupdate")
    latestBy(sink, "cnt_24h", "event_id").orderBy(col("event_id"))
  }

  /** The stats twin of anchoredUpdateStateful: update-mode per-event
    * stats with retraction. Corrections are not monotone in any stat
    * column, so emissions carry a per-key revision and read-back keeps
    * the max-rev row per event before dropping it. */
  def anchoredStatsUpdateStateful(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = eventStream(spark, dir)
      .select(col("event_id"), col("user_id"), col("ems"), col("value"))
      .as[StatefulFeatures.EventIn]
    val out = StatefulFeatures.anchoredStatsUpdate(in).toDF()
    val sink = runToMemory(spark, out, "update", "anchoredstatsupdate")
    latestBy(sink, "rev", "event_id").drop("rev").orderBy(col("event_id"))
  }

  /** Replay/backfill watermark for the verify pipelines: with
    * EventTimeTimeout, the stateful operator DROPS input rows below the
    * watermark — so the delay must exceed the dataset's total
    * out-of-orderness or a multi-micro-batch replay would silently lose
    * late rows the batch oracle includes. 30 days covers the full event
    * range; a live deployment tunes this down to its lateness SLA (the
    * eviction semantics are proven separately in StreamingSpec with a
    * tight watermark). */
  private val ReplayDelay = "30 days"

  /** The session twin of the update-mode retraction pipelines: late
    * events can merge sessions, so the sink keeps every correction and
    * read-back takes the max-rev row per event. */
  def sessionStepsUpdateStateful(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = eventStream(spark, dir)
      .select(col("event_id"), col("user_id"), col("ems"), col("event_type"))
      .as[StatefulFeatures.SessEventIn]
    val out = StatefulFeatures.sessionStepsUpdate(in).toDF()
    val sink = runToMemory(spark, out, "update", "sessionupdate")
    latestBy(sink, "rev", "event_id").drop("rev").orderBy(col("event_id"))
  }

  /** Chunked replay of the `documents` table in doc_id order — the
    * corpus-ingestion twin of [[eventStreamReplay]] (documents have no
    * event time; arrival order IS the ingestion order, so range-chunking
    * by doc_id and replaying oldest-file-first reproduces an id-ordered
    * ingestion log). */
  def docStreamReplay(spark: SparkSession, dir: String,
                      nChunks: Int = 4,
                      shuffled: Boolean = false): DataFrame = {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import java.nio.charset.StandardCharsets
    import scala.jdk.CollectionConverters._
    val path = s"$dir/documents.parquet"
    val src = Paths.get(path)
    val order = if (shuffled) "shuf" else "id"
    val stage = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_docreplay_" + path.replaceAll("[^A-Za-z0-9]", "_") +
        s"_${nChunks}_${order}_p$procToken")
    val marker = stage.resolve("_staged")
    val sig =
      s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}:v1"
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), StandardCharsets.UTF_8) == sig
    if (!fresh) {
      if (Files.exists(stage)) {
        val walk = Files.walk(stage)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
        finally walk.close()
      }
      // shuffled = chunks range-partitioned on md5(doc_id): doc ids
      // arrive in hash order across batches, so later micro-batches
      // genuinely contain SMALLER ids than earlier ones — the arrival
      // disorder the keep-min retraction ops exist for
      val orderCol =
        if (shuffled) md5(col("doc_id").cast("string").cast("binary"))
        else col("doc_id") // numeric: the id-ORDERED replay contract
      graft.core.Tables.documents(spark, dir)
        .withColumn("_ord", orderCol)
        .repartitionByRange(nChunks, col("_ord"))
        .sortWithinPartitions(col("_ord"))
        .drop("_ord")
        .write.mode("overwrite").parquet(stage.toString)
      val listing = Files.list(stage)
      val parts =
        try listing.iterator().asScala
          .filter(_.getFileName.toString.startsWith("part-")).toSeq
          .sortBy(_.getFileName.toString)
        finally listing.close()
      val t0 = Files.getLastModifiedTime(src).toMillis
      parts.zipWithIndex.foreach { case (p, i) =>
        Files.setLastModifiedTime(p, FileTime.fromMillis(t0 + i * 1000L))
      }
      Files.write(marker, sig.getBytes(StandardCharsets.UTF_8))
    }
    val schema = spark.read.parquet(stage.toString).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString)
  }

  /** Chunked replay of the corpus as PRE-COMPUTED LSH band posts
    * (doc_id, band_val) — the fingerprint-service/collision-service
    * split (round 12, verdict r11 #1). The per-doc shingle+minhash md5
    * map is stateless, embarrassingly parallel, and identical to the
    * batch path's (TextAnalysis.lshBandRows — the same expression
    * constants), so it runs ONCE per process at replay staging, exactly
    * like funnelFlags caches the funnel verdicts; what the streaming
    * queries then measure is the part that is actually stateful — the
    * band-keyed keep-first/keep-min collision service. In-stream
    * fingerprint cost remains covered by stream_corpus_funnel, which
    * fuses the same band computation into its replay scan. Chunk order
    * mirrors [[docStreamReplay]]: a doc's 4 band rows share its `_ord`
    * (doc_id, or md5(doc_id) for the shuffled retraction twin), so
    * micro-batch composition per doc is unchanged and every per-arrival
    * verdict is identical to the fused form. */
  def bandStreamReplay(spark: SparkSession, dir: String,
                       nChunks: Int = 4,
                       shuffled: Boolean = false): DataFrame = {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import java.nio.charset.StandardCharsets
    import scala.jdk.CollectionConverters._
    val path = s"$dir/documents.parquet"
    val src = Paths.get(path)
    val order = if (shuffled) "shuf" else "id"
    val stage = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_bandreplay_" + path.replaceAll("[^A-Za-z0-9]", "_") +
        s"_${nChunks}_${order}_p$procToken")
    val marker = stage.resolve("_staged")
    // the staged log is valid only while the band EXPRESSIONS are the
    // ones that produced it — key the signature on a content hash of
    // the lshBandRows plan (over an empty local relation: stable string,
    // no paths) instead of a hand-bumped version tag a future edit can
    // forget (round-12 advice: stale pre-computed bands would silently
    // feed stream_dedup_minhash otherwise)
    // exprIds (`doc_id#123L`) are session-lifetime counters, so the raw
    // plan string differs on EVERY call — an unnormalized hash restaged
    // the log per invocation (caught by the round-13 bench:
    // stream_dedup_minhash 2.3 -> 16 s). Strip them; any real edit to
    // the band expressions still changes the normalized string.
    val planStr = graft.queries.TextAnalysis.lshBandRows(
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))))
      .queryExecution.logical.toString.replaceAll("#\\d+", "#")
    val exprHash = java.security.MessageDigest.getInstance("MD5")
      .digest(planStr.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    val sig =
      s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}:$exprHash"
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), StandardCharsets.UTF_8) == sig
    if (!fresh) {
      if (Files.exists(stage)) {
        val walk = Files.walk(stage)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
        finally walk.close()
      }
      val orderCol =
        if (shuffled) md5(col("doc_id").cast("string").cast("binary"))
        else col("doc_id") // numeric: the id-ORDERED replay contract
      graft.queries.TextAnalysis.lshBandRows(
          graft.core.Tables.documents(spark, dir)
            .select(col("doc_id"), col("text")))
        .withColumn("_ord", orderCol)
        .repartitionByRange(nChunks, col("_ord"))
        .sortWithinPartitions(col("_ord"), col("band_val"))
        .drop("_ord")
        .write.mode("overwrite").parquet(stage.toString)
      val listing = Files.list(stage)
      val parts =
        try listing.iterator().asScala
          .filter(_.getFileName.toString.startsWith("part-")).toSeq
          .sortBy(_.getFileName.toString)
        finally listing.close()
      val t0 = Files.getLastModifiedTime(src).toMillis
      parts.zipWithIndex.foreach { case (p, i) =>
        Files.setLastModifiedTime(p, FileTime.fromMillis(t0 + i * 1000L))
      }
      Files.write(marker, sig.getBytes(StandardCharsets.UTF_8))
    }
    val schema = spark.read.parquet(stage.toString).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString)
  }

  /** Streaming MinHash near-dup dedup: the streaming twin of
    * dedup_minhash_lsh's candidate layer, consuming the
    * [[bandStreamReplay]] fingerprint-post log (each document's 4 LSH
    * band values, computed once per process at staging by the batch
    * path's own lshBandRows expressions). Each band bucket keeps its
    * FIRST document (StatefulFeatures.bucketFirstUpdate, O(1) state per
    * bucket), and a doc is a near-duplicate iff any band lost to an
    * earlier doc. At 100 TB this is the shape that works: the stream
    * never joins doc-to-doc — the only shuffle is the band-bucket key,
    * state is one id per bucket, and the verdict per doc is a 4-row
    * rollup. The batch oracle mirrors with a window MIN per band_val. */
  def dedupMinhashStream(spark: SparkSession, dir: String,
      nChunks: Int = 2,
      stateParts: String = StatePartitions): DataFrame = {
    // 2-chunk pin (round 14, PartsSweep `bandstate`: 2.13 s vs 2.56 s at
    // 4 chunks, median-of-3 warm at sf0.1). Chunk-count invariance: the
    // replay is doc_id-ordered, so the keep-first winner per band bucket
    // is the MIN-id poster at ANY chunk boundary (within-batch ties
    // reconcile to min id, across batches the earlier batch won already);
    // 2 batches still exercise genuine cross-batch keep-first state (a
    // batch-2 post losing to a batch-1 owner). The keep-min RETRACTION
    // twin stays on its 4-chunk SHUFFLED replay — churn across batches
    // is its story.
    import spark.implicits._
    val in = bandStreamReplay(spark, dir, nChunks)
      .select(col("band_val"), col("doc_id"))
      .as[StatefulFeatures.BandIn]
    val out = StatefulFeatures.bucketFirstUpdate(in).toDF()
    val sink = runToMemory(spark, out, "update", "minhashdedup", stateParts)
    sink.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bands"),
        sum(when(col("winner_id") === col("doc_id"), 1L).otherwise(0L))
          .as("n_first"),
        min(when(col("winner_id") < col("doc_id"), col("winner_id")))
          .as("dup_of_raw"))
      .select(col("doc_id"), col("n_bands"), col("n_first"),
        (col("n_first") < col("n_bands")).as("is_duplicate"),
        coalesce(col("dup_of_raw"), lit(-1L)).as("dup_of"))
      .orderBy(col("doc_id"))
  }

  /** Streaming INCREMENTAL dedup (round 14, verdict r13 #6) — the
    * streaming twin of dedup_incremental_bands: a NEW crawl snapshot
    * (doc_id % 3 == 0, same split as the batch twin) streams in
    * id-ordered off the [[bandStreamReplay]] fingerprint-post log and
    * dedups against (a) the ACCEPTED corpus — a stateless stream-static
    * band-index probe, the enrichment shape: the index is batch-built
    * once (train-once localCheckpoint — a stream-static join re-executes
    * the static plan per micro-batch) and met at scan speed — and (b)
    * EARLIER new docs — [[StatefulFeatures.bucketPairs]] member-list
    * state over only the new snapshot's band posts, so state is bounded
    * by |new|'s posts and old×old pairs never exist anywhere in the
    * pipeline. The finale unions both candidate sources, confirms at
    * exact shingle Jaccard ≥ 0.5 against the checkpointed signatures,
    * and rolls up per new doc — the batch twin's exact tail. With the
    * id-ordered replay, arrival order = the (is_new, doc_id) rank
    * order, so the discovered pair set equals the batch rank rule at
    * any chunk count; 2 chunks exercise genuine cross-batch member
    * state (a batch-2 doc pairing with a batch-1 member). Oracle = the
    * full-pairing-restricted SQL verbatim (a bug in either candidate
    * source fails the hash). */
  def dedupIncrementalStream(spark: SparkSession, dir: String,
      nChunks: Int = 2,
      stateParts: String = StatePartitions): DataFrame = {
    import spark.implicits._
    graft.functions.SortedIntersectCount.register(spark)
    // shared session-cached corpus signatures (round 14) — the frame is
    // already localCheckpoint'd (train-once static side); only the cheap
    // band explode is re-checkpointed per invocation
    val sig = graft.queries.TextAnalysis.corpusSigFrame(spark, dir)
    val corpusBands = sig.filter(col("doc_id") % 3 =!= 0)
      .select(explode(col("bands")).as("band_val"), col("doc_id").as("o"))
      .localCheckpoint(true)
    val newBands = bandStreamReplay(spark, dir, nChunks)
      .filter(col("doc_id") % 3 === 0)
    val vsCorpus = newBands.join(corpusBands, Seq("band_val"))
      .select(col("doc_id").as("n"), col("o"))
    val sinkC = runToMemory(spark, vsCorpus, "append", "incdedupold",
      stateParts)
    val pairs = StatefulFeatures.bucketPairs(
        newBands.select(col("band_val"), col("doc_id"))
          .as[StatefulFeatures.BandIn]).toDF()
    val sinkN = runToMemory(spark, pairs, "update", "incdedupnew",
      stateParts)
    val cand = sinkC.select(col("n"), col("o"))
      .union(sinkN.select(col("n"), col("o"))).distinct()
    val matches = cand
      .join(sig.select(col("doc_id").as("n"), col("sj").as("sa")), Seq("n"))
      .join(sig.select(col("doc_id").as("o"), col("sj").as("sb")), Seq("o"))
      .withColumn("conf",
        when(expr("sorted_intersect_count(sa, sb)") * 3 >=
          size(col("sa")).cast("long") + size(col("sb")), 1L).otherwise(0L))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("n_candidates"), sum(col("conf")).as("n_matches"))
    graft.core.Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 0).select(col("doc_id"))
      .join(matches.withColumnRenamed("n", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_matches"), lit(0L)).cast("long").as("n_matches"),
        (coalesce(col("n_matches"), lit(0L)) > 0).as("is_dup"))
      .orderBy(col("doc_id"))
  }

  /** Streaming train/eval decontamination (round-7 verdict #5): the
    * curation funnel's last stage as a per-row verdict over the doc
    * replay stream. The eval-gram set is built BATCH-side from the
    * static held-out suite (small by construction), driver-collected
    * once and broadcast — the same bounded-side discipline as the batch
    * gate's broadcast join — then every arriving train doc is graded
    * STATELESSLY in one pass: hash its 8-token windows, probe the
    * broadcast map, emit (n_grams, n_overlap, contaminated, eval_src).
    * No shuffle, no state store — at 100 TB the train stream meets the
    * fixed eval set at scan speed, which is why this twin is a map, not
    * an aggregation (a per-doc groupBy would grow state with the
    * corpus). Same oracle as text_decontaminate. */
  def decontaminateStream(spark: SparkSession, dir: String,
      nChunks: Int = GateReplayChunks): DataFrame = {
    import spark.implicits._
    val evalGrams: Map[Long, Long] =
      graft.queries.TextAnalysis.evalGramTable(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bc = spark.sparkContext.broadcast(evalGrams)
    val in = graft.queries.TextAnalysis.gramRows(
        spread(docStreamReplay(spark, dir, nChunks)
          .select(col("doc_id"), col("text")), "doc_id"))
      .filter(col("doc_id") % 50 =!= 0)
      .as[(Long, Seq[Long])]
    val out = in.map { case (docId, grams) =>
      val m = bc.value
      var n = 0L
      var ev = Long.MaxValue
      grams.foreach { g =>
        m.get(g) match {
          case Some(src) => n += 1; if (src < ev) ev = src
          case None => ()
        }
      }
      (docId, grams.size.toLong, n, n > 0, if (n > 0) ev else -1L)
    }.toDF("doc_id", "n_grams", "n_overlap", "contaminated", "eval_src")
    runToMemory(spark, out, "append", "decontam")
      .orderBy(col("doc_id"))
  }

  /** Streaming FUZZY decontamination (round 9): the paraphrase-level
    * twin of [[decontaminateStream]] — per arriving train doc, probe the
    * broadcast eval-side LSH band index for candidates, score exact
    * shingle Jaccard against the broadcast eval signatures (two-pointer
    * walk over the sorted 60-bit hash arrays), keep the best match.
    * Both broadcast sides are the BENCHMARK SUITE (small by
    * construction); the train stream is graded STATELESSLY in one map —
    * no shuffle, no state store, scan-speed at 100 TB. Candidates are
    * iterated in ascending eval-doc order with a strict > comparison, so
    * ties resolve to the smallest eval id — the oracle's
    * (jaccard DESC, ev_doc) ranking. Same oracle as
    * text_decontaminate_fuzzy. */
  def decontaminateFuzzyStream(spark: SparkSession, dir: String,
      nChunks: Int = GateReplayChunks): DataFrame = {
    import spark.implicits._
    val evalSig = graft.queries.TextAnalysis.fuzzySigRows(
        graft.core.Tables.documents(spark, dir)
          .filter(col("doc_id") % 50 === 0)
          .select(col("doc_id"), col("text")))
      .collect()
    val evSj: Map[Long, Array[Long]] = evalSig
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val evBands: Map[String, Array[Long]] = evalSig
      .flatMap(r => r.getSeq[String](2).map(bv => bv -> r.getLong(0)))
      .groupBy(_._1).map { case (bv, xs) => bv -> xs.map(_._2).sorted }
    val bcSj = spark.sparkContext.broadcast(evSj)
    val bcBands = spark.sparkContext.broadcast(evBands)
    val in = graft.queries.TextAnalysis.fuzzySigRows(
        spread(docStreamReplay(spark, dir, nChunks)
          .select(col("doc_id"), col("text")), "doc_id"))
      .filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"), col("sj"), col("bands"))
      .as[(Long, Seq[Long], Seq[String])]
    def inter(a: Array[Long], b: Array[Long]): Long = {
      var i = 0; var j = 0; var n = 0L
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { n += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1 else j += 1
      }
      n
    }
    val out = in.map { case (id, sjSeq, bands) =>
      val sj = sjSeq.toArray
      val cands = bands.iterator
        .flatMap(bv => bcBands.value.getOrElse(bv, Array.empty[Long]))
        .toArray.distinct.sorted
      var bestEv = -1L; var bestI = 0L; var bestU = 0L; var bestJ = -1.0
      cands.foreach { ev =>
        val sje = bcSj.value(ev)
        val in0 = inter(sj, sje)
        val un = sj.length.toLong + sje.length - in0
        val jac = in0.toDouble / un
        if (jac > bestJ) { bestJ = jac; bestEv = ev; bestI = in0; bestU = un }
      }
      (id, cands.length.toLong, bestEv, bestI, bestU,
        bestEv != -1L && bestI * 2 >= bestU)
    }.toDF("doc_id", "n_candidates", "best_eval", "inter", "un",
      "contaminated")
    runToMemory(spark, out, "append", "decontamfuzzy")
      .orderBy(col("doc_id"))
  }

  /** Streaming BLOOM GATE (round 10, closing the round-9 verdict note on
    * rel_bloom_semi_join): a 4096-bit bloom filter over "flagged
    * transaction fingerprints" (distinct user:props-k pairs of purchases
    * with value > 97 — the chargeback-log shape, bounded by the key
    * space) gates the event stream STATELESSLY; candidate rows land in
    * the sink and a batch rollup reports, per event type, the candidate
    * count, the exact-member count, and the FALSE-POSITIVE count. Unlike
    * rel_bloom_semi_join (whose oracle checks only the semi-join result),
    * this oracle RECOMPUTES the filter from the md5 bit positions in pure
    * SQL — build (bit_or of 1<<pos%32 into 128 32-bit words; 32-bit, not
    * 64: DuckDB's checked shift rejects bit 63) and probe (3 word lookups
    * + shift-and-mask per row) — so a wrong bit position changes
    * n_candidates/n_false_pos and fails the hash. The measured false
    * positives (~0.6% at sf0.01) prove the bit math, not just the
    * membership outcome.
    *
    * Scale shape: the build is a declarative aggregation (explode 3 hash
    * seeds, bit_or per word — map-side combine collapses it), the
    * collected words are 128 longs (bounded by mBits, not by data), and
    * the stream gate is a broadcast stateless filter entirely inside
    * whole-stage codegen — scan speed at 100 TB, shuffle only the
    * surviving candidates. */
  def bloomGateStream(spark: SparkSession, dir: String): DataFrame = {
    val MBits = 4096
    val keyCol = concat(col("user_id"), lit(":"),
      get_json_object(col("props"), "$.k"))
    val dim = graft.core.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase" && col("value") > 97)
      // a props row without key 'k' concats to a NULL k; collect would
      // unbox its NULL wi/bits to 0 and clobber word 0 of the filter —
      // the oracle drops NULL keys via join non-match, so drop them here
      .select(keyCol.as("k")).filter(col("k").isNotNull).distinct()
    val words = dim
      .select(explode(expr("sequence(0, 2)")).as("i"), col("k"))
      .select(expr(s"""cast(conv(substr(md5(cast(concat(i, ':', k) as binary)),
        |  1, 8), 16, 10) as bigint) % $MBits""".stripMargin).as("pos"))
      .select(expr("pos div 32").as("wi"),
        expr("shiftleft(1L, cast(pos % 32 as int))").as("w"))
      .groupBy(col("wi")).agg(expr("bit_or(w)").as("bits"))
    // dense word array: <= mBits/32 = 128 longs by construction
    val arr = new Array[Long](MBits / 32)
    words.collect().foreach(r =>
      arr(r.getAs[Long]("wi").toInt) = r.getAs[Long]("bits"))
    def posSql(i: Int) =
      s"(cast(conv(substr(md5(cast(concat('$i:', k) as binary)), 1, 8), " +
        s"16, 10) as bigint) % $MBits)"
    val passSql = (0 until 3).map(i =>
      s"((shiftright(element_at(bw, cast(${posSql(i)} div 32 as int) + 1), " +
        s"cast(${posSql(i)} % 32 as int)) & 1) = 1)").mkString(" AND ")
    // passSql references each position expression twice (word index +
    // bit offset) = 6 md5 per row, on the single-partition micro-batch
    // — spread before the probe (round 14)
    val cand = spread(eventStream(spark, dir)
        .select(col("event_id"), col("event_type"), col("user_id"),
          col("props")), "event_id")
      .withColumn("k", keyCol)
      .withColumn("bw", array(arr.toIndexedSeq.map(lit): _*))
      .filter(expr(passSql))
      .select(col("event_id"), col("event_type"), col("k"))
    val sink = runToMemory(spark, cand, "append", "bloomgate")
    sink.join(dim.withColumn("is_true", lit(true)), Seq("k"), "left")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_candidates"),
        sum(when(col("is_true"), 1L).otherwise(0L)).cast("long").as("n_true"))
      .withColumn("n_false_pos", (col("n_candidates") - col("n_true")).cast("long"))
      .orderBy(col("event_type"))
  }

  /** Streaming PRIORITY SAMPLE (round 10) — distributed reservoir
    * sampling as bottom-k sketch state: per event type,
    * `SketchState.kmvBottomK` keeps the 8 smallest 60-bit md5 priorities
    * as one sorted primitive array — O(k) state per type REGARDLESS of
    * stream length, the reservoir property, and the arrays union like
    * any KMV sketch (day N's sample merges with day N+1's). The final
    * sketch's hashes map back to their rows by one broadcast join
    * against the static table (≤ 8 hashes per type — bounded by k·types,
    * not data), re-ranked (h, event_id) with limit 8 per type, which
    * keeps even a 60-bit priority collision exact: the collided ids rank
    * adjacently under the same rule the oracle applies. Same oracle as
    * the batch `ml_priority_sample`. */
  def prioritySampleStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val hSql = "cast(conv(substr(md5(cast(cast(event_id as string) " +
      "as binary)), 1, 15), 16, 10) as bigint)"
    val in = eventStream(spark, dir)
      .select(col("event_type").as("side"), expr(hSql).as("h"))
      .as[SketchState.KmvIn]
    val sink = runToMemory(spark,
      SketchState.kmvBottomK(in, 8).toDF(), "update", "prisample")
    val fin = latestBy(sink, "rev", "side")
      .select(col("side").as("event_type"), explode(col("hs")).as("h"))
    graft.core.Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"))
      .withColumn("h", expr(hSql))
      .join(broadcast(fin), Seq("event_type", "h"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("h"), col("event_id"))).cast("long"))
      .filter(col("rk") <= 8)
      .select(col("event_type"), col("rk"), col("event_id"), col("h"))
      .orderBy(col("event_type"), col("rk"))
  }

  /** Streaming WEIGHTED priority sample (round 10) — the integer-weight
    * ticket form of [[prioritySampleStream]]: each arriving event fans
    * out into w ∈ 1..4 md5 tickets and `SketchState.kmvBottomK` keeps the
    * 32 smallest TICKET hashes per type. 32 is not a heuristic: an item
    * in the true top-8 by min-ticket has at most 7 items ranked below
    * it, each owning ≤ 4 tickets smaller than its min — ≤ 28 smaller
    * tickets total, so its min ticket always survives a bottom-32 state.
    * Conversely any item whose RETAINED min ranks top-8 must have its
    * true min retained (a smaller evicted ticket would imply a smaller
    * retained one). So the finale — join the ≤ 32·types retained hashes
    * back to the ticket table, per-item min, re-rank (mh, event_id),
    * limit 8 — is EXACT, and the state stays one sorted ≤32-long
    * primitive array per type regardless of stream length. Same oracle
    * as the batch `ml_weighted_sample`. */
  def weightedSampleStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val thSql = "cast(conv(substr(md5(cast(concat(cast(event_id as string)" +
      ", ':', cast(t as string)) as binary)), 1, 15), 16, 10) as bigint)"
    def tickets(df: DataFrame): DataFrame = df
      .select(col("event_type"), col("event_id"),
        (lit(1L) + floor(col("value") * 100.0 + 0.5).cast("long") % 4)
          .as("w"))
      .withColumn("t", explode(expr("sequence(1L, w)")))
      .withColumn("th", expr(thSql))
    val in = tickets(eventStream(spark, dir))
      .select(col("event_type").as("side"), col("th").as("h"))
      .as[SketchState.KmvIn]
    val sink = runToMemory(spark,
      SketchState.kmvBottomK(in, 32).toDF(), "update", "wsample")
    val fin = latestBy(sink, "rev", "side")
      .select(col("side").as("event_type"), explode(col("hs")).as("th"))
    tickets(graft.core.Tables.events(spark, dir))
      .join(broadcast(fin), Seq("event_type", "th"))
      .groupBy(col("event_type"), col("event_id"), col("w"))
      .agg(min(col("th")).as("mh"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("mh"), col("event_id"))).cast("long"))
      .filter(col("rk") <= 8)
      .select(col("event_type"), col("rk"), col("event_id"), col("w"),
        col("mh"))
      .orderBy(col("event_type"), col("rk"))
  }

  /** Streaming IMAGE near-dup collision service (round 10) — the
    * multimodal member of the keep-first family: each arriving image is
    * synthesized + REAL-decoded + aHashed on the executors
    * ([[graft.pipeline.Multimodal.phashImages]] over the replayed ids),
    * and its four 16-bit hash bands post into band-keyed keep-first
    * state (`bucketFirstUpdate`, fourth reuse — band_val = "k:v" so
    * equal words under different band indexes never collide). A post
    * into an owned bucket IS the near-dup candidate, emitted at
    * arrival; with the id-ordered replay the owner is the global min
    * poster, so the pair set is the KEEP-FIRST projection of the batch
    * `dedup_phash_images` pairs (the service semantics: later uploads
    * match against the corpus owner). Exact Hamming ≤ 3 filter on the
    * bounded candidate set; state one winner per distinct band value. */
  def phashDedupStream(spark: SparkSession, dir: String,
      nChunks: Int = 2): DataFrame = {
    // 2-chunk pin (round 14, PartsSweep `bandstate`: 2.65 s vs 3.07 s at
    // 4 chunks) — same id-ordered keep-first invariance argument as
    // dedupMinhashStream; 2 batches keep the cross-batch owner story.
    import spark.implicits._
    import graft.pipeline.Multimodal
    def bandRows(ids: DataFrame) = Multimodal.phashImages(
        Multimodal.synthNearDupImageTable(spark, ids))
      .toDF()
      .select(col("media_id"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("k", "v")))
    val in = bandRows(
      docStreamReplay(spark, dir, nChunks).select(col("doc_id")))
      .select(concat(col("k"), lit(":"), col("v")).as("band_val"),
        col("media_id").as("doc_id"))
      .as[StatefulFeatures.BandIn]
    val sink = runToMemory(spark,
      StatefulFeatures.bucketFirstUpdate(in).toDF(), "update", "phashdedup")
    val hw = Multimodal.phashImages(
        Multimodal.synthNearDupImageTable(spark,
          graft.core.Tables.documents(spark, dir).select(col("doc_id"))))
      .toDF()
    val pa = hw.select(col("media_id").as("ma"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val pb = hw.select(col("media_id").as("mb"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    sink.filter(col("winner_id") < col("doc_id"))
      .select(col("winner_id").as("ma"), col("doc_id").as("mb"))
      .distinct()
      .join(pa, Seq("ma")).join(pb, Seq("mb"))
      .withColumn("hamming", expr(
        "bit_count(a0 ^ c0) + bit_count(a1 ^ c1) + " +
          "bit_count(a2 ^ c2) + bit_count(a3 ^ c3)").cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("ma"), col("mb"), col("hamming"))
      .orderBy(col("ma"), col("mb"))
  }

  /** Streaming DSIR gate (round 10) — the importance-scoring twin of the
    * batch `corpus_dsir_sample`, in the broadcast-model contract of
    * [[decontaminateStream]]/[[lmScoreStream]]: the 64-bucket integer-log
    * weight table is trained batch-side (bounded by bucket count,
    * `CorpusPipeline.dsirWeights`), broadcast, and every arriving train
    * doc is scored STATELESSLY — bucket its bigrams with the identical
    * Spark-side hash expression, sum broadcast weights (occurrences in
    * buckets outside the map are skipped, mirroring the batch query's
    * inner joins). Top-20 finale over the bounded sink; same oracle. */
  def dsirGateStream(spark: SparkSession, dir: String,
      nChunks: Int = GateReplayChunks): DataFrame = {
    import spark.implicits._
    val w = spark.sparkContext.broadcast(
      graft.queries.CorpusPipeline.dsirWeights(spark, dir))
    val in = spread(docStreamReplay(spark, dir, nChunks)
        .select(col("doc_id"), col("text")), "doc_id")
      .filter(col("doc_id") % 50 =!= 0)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        expr(graft.queries.CorpusPipeline.dsirBucketsExpr).as("bs"))
      .as[(Long, Seq[Long])]
    val scored = in.map { case (id, bs) =>
      val m = w.value
      var s = 0L
      var n = 0L
      bs.foreach { b =>
        m.get(b) match {
          case Some(wt) => s += wt; n += 1
          case None => ()
        }
      }
      (id, s, n)
    }.toDF("doc_id", "score", "n_bigrams")
      .filter(col("n_bigrams") > 0)
    runToMemory(spark, scored, "append", "dsirgate")
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("score"), col("n_bigrams"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** embeddings.parquet staged as a vec_id-ORDERED nChunks file stream —
    * docStreamReplay's staging contract for the vector table. */
  def embStreamReplay(spark: SparkSession, dir: String,
      nChunks: Int = 2): DataFrame = {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import java.nio.charset.StandardCharsets
    import scala.jdk.CollectionConverters._
    val path = s"$dir/embeddings.parquet"
    val src = Paths.get(path)
    val stage = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_embreplay_" + path.replaceAll("[^A-Za-z0-9]", "_") +
        s"_${nChunks}_p$procToken")
    val marker = stage.resolve("_staged")
    val sig =
      s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}:v1"
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), StandardCharsets.UTF_8) == sig
    if (!fresh) {
      if (Files.exists(stage)) {
        val walk = Files.walk(stage)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
        finally walk.close()
      }
      graft.core.Tables.embeddings(spark, dir)
        .repartitionByRange(nChunks, col("vec_id"))
        .sortWithinPartitions(col("vec_id"))
        .write.mode("overwrite").parquet(stage.toString)
      val listing = Files.list(stage)
      val parts =
        try listing.iterator().asScala
          .filter(_.getFileName.toString.startsWith("part-")).toSeq
          .sortBy(_.getFileName.toString)
        finally listing.close()
      val t0 = Files.getLastModifiedTime(src).toMillis
      parts.zipWithIndex.foreach { case (p, i) =>
        Files.setLastModifiedTime(p, FileTime.fromMillis(t0 + i * 1000L))
      }
      Files.write(marker, sig.getBytes(StandardCharsets.UTF_8))
    }
    val schema = spark.read.parquet(stage.toString).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage.toString)
  }

  /** Streaming kNN label-vote classification (round-11, verdict r10 #7)
    * — the broadcast-model gate contract (stream_dsir_gate) applied to
    * the persisted ANN index: the index (centroids + per-cell posting
    * lists with raw floats and hoisted norms) is read ONCE from the
    * shared persisted store at query start — the per-index-load collect
    * a serving node does — and rides to the executors as a broadcast.
    * Every arriving query vector (every 8th vec_id, the eval sample)
    * classifies STATELESSLY: probe the 3 nearest coarse cells, exact-
    * cosine-scan only their members (self excluded), vote over the
    * top-10 (cos ROUND HALF_UP to 6 dp desc, vec_id tie; majority vote,
    * ties → smallest label — bit-identical to the batch/oracle
    * discipline, including java.math.BigDecimal.valueOf rounding =
    * Spark's shortest-string HALF_UP). Zero streaming state, zero
    * stream-side shuffle, O(probed cells) per event. Finale aggregates
    * per class; oracle = the shared indexed-prediction CTE chain. */
  def knnClassifyStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (cent, cellsIdx) =
      graft.queries.Embeddings.annIndexForBroadcast(spark, dir)
    val bcCent = spark.sparkContext.broadcast(
      cent.map { case (c, v) => (c, v.toArray) }.sortBy(_._1).toArray)
    val bcIdx = spark.sparkContext.broadcast(cellsIdx)
    val in = embStreamReplay(spark, dir)
      .filter(col("vec_id") % 8 === 0)
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Seq[Float])]
    val out = in.flatMap { case (qid, trueLabel, qvSeq) =>
      val qv = qvSeq.toArray
      // qn: the same sequential square fold the batch path and oracle run
      var sq = 0.0
      var j = 0
      while (j < qv.length) { sq += qv(j).toDouble * qv(j).toDouble; j += 1 }
      val qn = math.sqrt(sq)
      // probe: top-3 cells by sequential-fold L2, ties on cell id
      val probes = bcCent.value.map { case (c, cv) =>
        var d = 0.0
        var i = 0
        while (i < cv.length) {
          val t = qv(i).toDouble - cv(i); d += t * t; i += 1
        }
        (d, c)
      }.sortBy(identity).take(3).map(_._2)
      // scan posting lists of probed cells: (rounded cos, vec_id, label)
      val cands = probes.iterator
        .flatMap(c => bcIdx.value.getOrElse(c, Array.empty[(Long, Int, Array[Float], Double)]))
        .filter(_._1 != qid)
        .map { case (vid, lbl, emb, nrm) =>
          var dot = 0.0
          var i = 0
          while (i < emb.length) {
            dot += qv(i).toDouble * emb(i).toDouble; i += 1
          }
          val cos = java.math.BigDecimal.valueOf(dot / (qn * nrm))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          (cos, vid, lbl)
        }.toArray
      if (cands.isEmpty) Iterator.empty
      else {
        val top = cands.sortBy { case (cos, vid, _) => (-cos, vid) }.take(10)
        val pred = top.groupBy(_._3).map { case (l, xs) => (xs.length, l) }
          .toSeq.sortBy { case (n, l) => (-n, l) }.head._2
        Iterator.single((qid, trueLabel, pred))
      }
    }.toDF("query_id", "true_label", "pred_label")
    val sink = runToMemory(spark, out, "append", "knncls")
    sink.groupBy(col("true_label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("pred_label") === col("true_label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("true_label").cast("long").as("label"),
        col("n_queries"), col("n_correct"),
        (col("n_correct").cast("double") / col("n_queries")).as("accuracy"))
      .orderBy(col("label"))
  }

  /** Streaming token-budget admission gate (round 11): the per-lang
    * cutoff gate over the id-ordered doc replay —
    * [[StatefulFeatures.budgetGate]] with the same 2000-token budget the
    * batch `corpus_budget_select` uses. Oracle = the per-lang windowed
    * running sum (kept ⇔ cum ≤ budget), exact because every arrival
    * consumes budget (prefix property). */
  def budgetGateStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = docStreamReplay(spark, dir, nChunks = 2)
      .select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .as[StatefulFeatures.BudgetIn]
    val out = StatefulFeatures.budgetGate(in, 2000L).toDF()
    runToMemory(spark, out, "append", "budgetgate")
      .select(col("doc_id"), col("lang"), col("n_tok"), col("kept"))
      .orderBy(col("doc_id"))
  }

  private[graft] val budgetGateSql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |      AS n_tok
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, lang, n_tok,
      |    SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM t
      |)
      |SELECT doc_id, lang, n_tok, cum <= 2000 AS kept
      |FROM c ORDER BY doc_id""".stripMargin

  /** Streaming WARM START from a batch snapshot (round 10) — the
    * batch→streaming CUTOVER every production feature platform performs:
    * per-user (count, cent-sum) state is SEEDED from a batch aggregate
    * over all events before the corpus midpoint timestamp
    * (`flatMapGroupsWithState`'s initialState — the engine's state
    * bootstrap surface), and the stream replays ONLY the second half;
    * the merged result must equal the batch query over the full
    * history, which is exactly what the oracle checks. The finale
    * coalesces snapshot-only users (no stream arrivals) from the
    * broadcast snapshot, so the result does not depend on whether the
    * runtime invokes initial-state-only keys. At 100 TB this is how a
    * stateful pipeline deploys against years of history: one batch
    * backfill writes the state, the stream pays only for the tail. */
  def warmStartStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = graft.core.Tables.events(spark, dir)
      .withColumn("ems", unix_millis(col("ts").cast("timestamp")))
      .withColumn("micro",
        floor(col("value") * 100.0 + 0.5).cast("long"))
    val r = ev.agg(min(col("ems")), max(col("ems"))).head()
    val split = (r.getLong(0) + r.getLong(1)) / 2
    val snap = ev.filter(col("ems") < split)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n0"), sum(col("micro")).as("s0"))
    val init = snap.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => StatefulFeatures.WarmState(t._2, t._3))
    val in = eventStream(spark, dir)
      .filter(col("ems") >= split)
      .select(col("user_id"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("micro"))
      .as[StatefulFeatures.WarmIn]
    val sink = runToMemory(spark,
      StatefulFeatures.warmStartCounts(in, init).toDF(), "update",
      "warmstart")
    val latest = latestBy(sink, "rev", "user_id")
      .select(col("user_id"), col("n_events"), col("sum_micro"))
    snap.join(latest, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        coalesce(col("n_events"), col("n0")).as("n_events"),
        coalesce(col("sum_micro"), col("s0")).as("sum_micro"))
      .orderBy(col("user_id"))
  }

  /** Streaming SCD2 point-in-interval lookup (round 10) — the production
    * enrichment shape for a slowly-changing dimension: the batch-built
    * SCD2 dim (bounded: versions per user, users < 40) is PACKED to one
    * sorted version-array row per user and broadcast; each arriving
    * purchase probes it with a stateless array filter (valid_from <= ts
    * < valid_to, last = max version, zero-width versions self-excluded
    * by the half-open predicate) — no streaming state, no shuffle on
    * the stream, exactly the broadcast-gate contract of
    * [[decontaminateStream]]. The batch twin ([[graft.queries
    * .EventAnalytics]] evt_scd_lookup) answers the same query as-of
    * style when the dim is too big to broadcast; same oracle. */
  def scdLookupStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // train ONCE: the stream-static join re-executes the static side per
    // micro-batch, so the packed dim (a full gaps-and-islands SCD2 build)
    // would re-derive each batch — cheap at this dim size, but the exact
    // shape the round-13 winsorize fix closed; checkpoint for consistency
    // (and for the larger dim tables a production deployment carries)
    val packed = graft.queries.EventAnalytics.scdDim(spark, dir)
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"version", $"dim_type",
        $"valid_from_ms", $"valid_to_ms"))).as("vs"))
      .localCheckpoint(true)
    val probes = eventStream(spark, dir)
      .filter($"user_id" < 40 && $"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ems")
    val out = probes.join(broadcast(packed), Seq("user_id"), "left_outer")
      .withColumn("m", expr(
        "filter(vs, s -> s.valid_from_ms <= ems AND " +
          "(s.valid_to_ms = -1 OR ems < s.valid_to_ms))"))
      .withColumn("hit", when(size($"m") > 0, expr("element_at(m, -1)")))
      .select($"user_id", $"event_id", $"ems",
        $"hit.version".as("version"), $"hit.dim_type".as("dim_type"),
        $"hit.valid_from_ms".as("valid_from_ms"))
    runToMemory(spark, out, "append", "scdlookup").orderBy($"event_id")
  }

  /** Streaming bigram-LM quality gate: the model (vocab-bounded bigram /
    * left-context count tables, trained batch-side on the same corpus) is
    * driver-collected once and broadcast; every arriving doc is scored
    * STATELESSLY in one pass with the identical integer bit-length
    * surrogate as text_lm_score — same oracle. At 100 TB the trained
    * counts are the bounded side (vocabulary, not corpus) and the doc
    * stream is scored at scan speed: a map, not an aggregation, so no
    * shuffle and no state store. In production the model would be
    * trained on yesterday's corpus; here it is trained on the replayed
    * corpus itself so the batch oracle grades the stream verdicts
    * exactly. */
  def lmScoreStream(spark: SparkSession, dir: String,
      nChunks: Int = GateReplayChunks): DataFrame = {
    import spark.implicits._
    val (_, uni, bi) = graft.queries.TextAnalysis.lmCountTables(spark, dir)
    val uniM: Map[String, Long] =
      uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val biM: Map[(String, String), Long] =
      bi.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
    val bcU = spark.sparkContext.broadcast(uniM)
    val bcB = spark.sparkContext.broadcast(biM)
    // bit length of a positive count == length(bin(n)) in both engines
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val in = spread(docStreamReplay(spark, dir, nChunks)
      .select(col("doc_id"), col("text")), "doc_id").as[(Long, String)]
    val out = in.map { case (docId, text) =>
      val toks = text.trim.split("\\s+")
      val u = bcU.value; val b = bcB.value
      var n = 0L
      var s = 0L
      var i = 0
      while (i < toks.length - 1) {
        s += bitlen(b((toks(i), toks(i + 1)))) - bitlen(u(toks(i)))
        n += 1
        i += 1
      }
      val avg = if (n > 0) s.toDouble / n else 0.0
      (docId, n, s, avg, avg > -5.0)
    }.toDF("doc_id", "n_bigrams", "lm_score", "avg_logp", "keep")
    runToMemory(spark, out, "append", "lmscore")
      .orderBy(col("doc_id"))
  }

  /** STREAMING CCNet gate — the broadcast-model contract applied to the
    * tercile split: the vocab-bounded LM count tables AND the per-lang
    * tercile cut scores (min avg_logp of the batch head/middle buckets —
    * 2 doubles per language) train batch-side, broadcast, and every
    * arriving doc scores + buckets STATELESSLY by threshold (ties at a
    * cut take the better bucket; the oracle re-derives the cuts and
    * re-buckets every doc by the same rule — TextAnalysis.ccnetGateSql).
    * Zero streaming state, zero stream-side shuffle. */
  def ccnetGateStream(spark: SparkSession, dir: String,
      nChunks: Int = GateReplayChunks): DataFrame = {
    import spark.implicits._
    val (_, uni, bi) = graft.queries.TextAnalysis.lmCountTables(spark, dir)
    val uniM: Map[String, Long] =
      uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val biM: Map[(String, String), Long] =
      bi.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
    // per-lang (t1, t2) cut scores — |langs| rows, a scalar-sized model.
    // A language with <3 docs leaves ntile buckets empty → NULL cuts; a
    // NaN default makes `avg >= cut` FALSE so the doc falls through to
    // the next branch, exactly the oracle's NULL-comparison behavior
    // (r11 advice — getDouble on a NULL threw at query-build time). The
    // replay==training-corpus assumption (every streamed lang/token was
    // seen batch-side) is inherited from lmScoreStream.
    val cutsM: Map[String, (Double, Double)] =
      graft.queries.TextAnalysis.ccnetDocBuckets(spark, dir)
        .groupBy(col("lang"))
        .agg(min(when(col("bucket") === 1, col("avg_logp"))).as("t1"),
          min(when(col("bucket") === 2, col("avg_logp"))).as("t2"))
        .collect().map { r =>
          def d(i: Int): Double = if (r.isNullAt(i)) Double.NaN else r.getDouble(i)
          r.getString(0) -> (d(1), d(2))
        }.toMap
    val bcU = spark.sparkContext.broadcast(uniM)
    val bcB = spark.sparkContext.broadcast(biM)
    val bcC = spark.sparkContext.broadcast(cutsM)
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val in = spread(docStreamReplay(spark, dir, nChunks)
      .select(col("doc_id"), col("lang"), col("text")), "doc_id")
      .as[(Long, String, String)]
    val out = in.map { case (docId, lang, text) =>
      val toks = text.trim.split("\\s+")
      val u = bcU.value; val b = bcB.value
      var n = 0L
      var s = 0L
      var i = 0
      while (i < toks.length - 1) {
        s += bitlen(b((toks(i), toks(i + 1)))) - bitlen(u(toks(i)))
        n += 1
        i += 1
      }
      val avg = if (n > 0) s.toDouble / n else 0.0
      val (t1, t2) = bcC.value(lang)
      val bucket = if (avg >= t1) 1L else if (avg >= t2) 2L else 3L
      (docId, lang, n, avg, bucket, bucket <= 2)
    }.toDF("doc_id", "lang", "n_bigrams", "avg_logp", "bucket", "kept")
    runToMemory(spark, out, "append", "ccnetgate")
      .orderBy(col("doc_id"))
  }

  /** Streaming ColBERT MaxSim gate — the broadcast-model contract on the
    * late-interaction matcher: the 5 query vectors' sub-vectors + norms
    * (Embeddings.colbertQueryModel, 5×64 doubles) broadcast; every
    * arriving corpus vector computes MaxSim against each query
    * STATELESSLY with the identical arithmetic (ascending dot/norm
    * folds, per-i max rounded via java.math.BigDecimal HALF_UP =
    * Spark's round, summed in i order) and emits pairs clearing the 4.8
    * threshold — threshold semantics, not top-k, because a stream cannot
    * rank against docs it has not seen. Zero streaming state, zero
    * stream-side shuffle; oracle = the batch MaxSim chain thresholded
    * (Embeddings.colbertGateSql). */
  def colbertGateStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      graft.queries.Embeddings.colbertQueryModel(spark, dir))
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val in = embStreamReplay(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Seq[Float])]
    val out = in.flatMap { case (did, lbl, embSeq) =>
      val emb = embSeq.toArray
      val dsubs = Array.tabulate(8)(j =>
        Array.tabulate(8)(t => emb(j * 8 + t).toDouble))
      val dn = dsubs.map { sv =>
        var s = 0.0; var t = 0
        while (t < 8) { s += sv(t) * sv(t); t += 1 }
        math.sqrt(s)
      }
      bc.value.iterator.filter(_._1 != did).flatMap { case (qid, qsub, qn) =>
        var maxsim = 0.0
        var i = 0
        while (i < 8) {
          var best = Double.NegativeInfinity
          var j = 0
          while (j < 8) {
            var dot = 0.0; var t = 0
            while (t < 8) { dot += qsub(i)(t) * dsubs(j)(t); t += 1 }
            val c = dot / (qn(i) * dn(j))
            if (c > best) best = c
            j += 1
          }
          maxsim += round6(best)
          i += 1
        }
        if (maxsim >= 4.8)
          Iterator.single((qid, did, lbl, round6(maxsim)))
        else Iterator.empty
      }
    }.toDF("query_id", "doc_id", "label", "maxsim")
    runToMemory(spark, out, "append", "colbertgate")
      .orderBy(col("query_id"), col("doc_id"))
  }

  /** Streaming online-bootstrap CI — the batch query's one-pass
    * aggregate run as a COMPLETE-mode aggregation with ONE row of
    * state: the identical 66 mergeable aggregate columns (32 replicate
    * (Σm·v, Σm) pairs + the point estimate's (n, Σv)), then the shared
    * order-statistic finale. Oracle = the batch SQL verbatim
    * (AnalyticsOps.bootstrapCiSql).
    *
    * Runs over the chunked replay at the measured monitor cadence
    * (round 14, verdict r13 #1 — this was the last complete-mode
    * monitor still reading the single-trigger eventStream, so its
    * cross-batch accumulation story was never exercised): the per-b
    * sums are commutative decimal/integer additions over the row
    * multiset, so the final complete-mode table is chunk-count
    * invariant BY ALGEBRA, and 2 batches genuinely demonstrate
    * replicate state carried and merged across micro-batches. */
  def bootstrapCiStream(spark: SparkSession, dir: String,
      nChunks: Int = MonitorReplayChunks): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.queries.AnalyticsOps.{withBootDigests, bootAggs, bootFinale}
    // ONE-ROW complete-mode state (round 14, shared with the batch
    // query's one-pass form): the 32 replicate (Σm·v, Σm) pairs + the
    // point estimate's (n, Σv) are 66 mergeable aggregate columns over
    // the replay — no 33× row fan-out, 8 md5s per event instead of 32,
    // and the in-flight state is a single row. Chunk-invariant by
    // algebra: every column is a commutative exact micro-long sum.
    val in = withBootDigests(eventStreamReplay(spark, dir, nChunks)
        .select(col("event_id"), col("value")))
      .withColumn("vm",
        (col("value").cast(DecimalType(25, 6)) * 1000000).cast("long"))
    val aggs = bootAggs()
    val agg = in.groupBy().agg(aggs.head, aggs.tail: _*)
    bootFinale(runToMemory(spark, agg, "complete", "bootci"))
  }

  /** Streaming Kaplan–Meier: per-user survival observations
    * (StatefulFeatures.survivalObservations — 3 primitives per user,
    * order-independent min/max/min state) in update mode; the finale
    * reads the max-rev row per user and runs the SAME life-table tail
    * as the batch query (AnalyticsOps.kmFromUsers), so the oracle is
    * the batch SQL verbatim. */
  def survivalKmStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = eventStream(spark, dir)
      .select(col("event_id"), col("user_id"), col("ems"),
        col("event_type"), col("value"))
      .as[StatefulFeatures.SurvEventIn]
    val out = StatefulFeatures.survivalObservations(in).toDF()
    val sink = runToMemory(spark, out, "update", "survkm")
    val u = latestBy(sink, "rev", "user_id")
      .select(col("s"), col("e"),
        when(col("p") >= 0L, col("p")).as("p"))
    graft.queries.AnalyticsOps.kmFromUsers(u)
  }

  /** Streaming U-shaped multi-touch attribution
    * (StatefulFeatures.positionCredits): per-user last-8 touch deque in
    * state, purchases credit at arrival; the finale is the same
    * channel rollup as the batch query, so the oracle is
    * AnalyticsOps.positionAttributionSql verbatim. */
  def positionAttributionStream(spark: SparkSession, dir: String)
      : DataFrame = {
    import spark.implicits._
    val in = eventStream(spark, dir)
      .select(col("event_id"), col("user_id"), col("ems"),
        col("event_type"), col("value"))
      .as[StatefulFeatures.TouchEventIn]
    val out = StatefulFeatures.positionCredits(in).toDF()
    val sink = runToMemory(spark, out, "append", "posattr")
    sink.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        sum(col("credit_micro")).as("credit_micro"))
      .orderBy(col("channel"))
  }

  /** The full corpus-curation funnel with every stage in STREAMING form
    * (round-7 composition flagship): the doc replay feeds five stage
    * verdicts — quality and repetition gates as stateless single-pass
    * maps (the shared frame-based cores, so batch and stream cannot
    * drift), train/eval decontamination as the broadcast gate, exact
    * dedup as keep-first state on the content hash (one bucket per
    * distinct text — `bucketFirstUpdate` reused with md5(text) as the
    * band), and MinHash near-dedup via the existing banded bucket
    * state. Round 14: ONE streaming query carries all five stages —
    * the stateless verdicts ride the stateful stages' replay scan as
    * namespaced rows through the shared state op (see the fusedIn
    * comment below); the survivor rollup is the SAME `funnelRollup`
    * the batch funnel reports through, so the oracle is the batch
    * funnel's SQL verbatim. */
  def curationFunnelStream(spark: SparkSession, dir: String,
      stateParts: String = LateUpdateParts,
      stageTimes: scala.collection.mutable.Map[String, Double] = null)
      : DataFrame = {
    import graft.queries.TextAnalysis
    // per-stage attribution hook (ScaleCheck's stream_corpus_funnel row —
    // round-11, verdict r10 #4): wall time of each streaming query; the
    // caller's total minus these is the finale rollup's batch cost
    def staged[A](name: String)(f: => A): A =
      if (stageTimes == null) f
      else {
        val t0 = System.nanoTime(); val r = f
        stageTimes(name) = (System.nanoTime() - t0) / 1e9; r
      }
    val evalGrams: Set[Long] = staged("decontam_broadcast") {
      TextAnalysis.evalGramTable(spark, dir)
        .collect().map(_.getLong(0)).toSet
    }
    val bc = spark.sparkContext.broadcast(evalGrams)
    // ALL FIVE stages in ONE streaming query (round 14; the round-10
    // fusion stopped at the two stateful stages). The stateless verdicts
    // — quality, repetition, decontamination — are pure per-doc maps
    // with no state, so they are chunk-invariant and can ride the SAME
    // 2-chunk replay scan that feeds the stateful stages instead of
    // paying a second streaming query's startup + sink + scan (~4 s
    // in-suite, measured by FunnelProbe; the gate columns themselves
    // cost ~0.5 s in batch, GateProbe). Each verdict travels as a row
    // through the shared bucketFirstUpdate state space under its own
    // namespace:
    //  - 'x' + md5(text)          exact dedup (keep-first, round 10)
    //  - '0'..'3'-prefixed bands  MinHash near-dedup (band values are
    //                             '<b>:h1:h2', degrading to bare
    //                             '0'..'3' on sub-shingle docs — the
    //                             PREFIX is the robust namespace tag)
    //  - 'q1'/'q0', 'r1'/'r0',    per-doc verdicts; constant band_val
    //    'd1'/'d0'                per verdict = six singleton state
    //                             buckets, and the per-arrival
    //                             passthrough emission carries
    //                             (band_val, doc_id) to the sink
    // Emission rules preserve funnelRollup's join semantics exactly:
    // q/r rows only for >=2-token docs (the rollup's inner join drops
    // the rest — the old stateless pass's filter), d rows only for
    // train docs (eval docs' NULL dc0 was filtered before the left
    // join).
    val fusedIn = {
      import spark.implicits._
      import graft.queries.TextAnalysis._
      TextAnalysis.withRepetitionCols(
          TextAnalysis.withQualityCols(
              docStreamReplay(spark, dir, nChunks = 2)
                .select(col("doc_id"), col("text"), col("n_chars"))
                // a micro-batch reads ONE staged file = one input
                // partition; without this exchange the per-doc gate
                // columns (the O(tokens²) repetition fold, three md5
                // chains) would run on a single core per batch. Hash
                // on doc_id (deterministic under task retry), width =
                // the session's core count, not a constant
                .repartition(spark.sparkContext.defaultParallelism,
                  col("doc_id"))
                .withColumn("toks", split(trim(col("text")), "\\s+")))
            .withColumnRenamed("keep", "q"))
        .withColumnRenamed("keep", "r")
        .withColumn("grams", TextAnalysis.gramCol)
        .withColumn("sh", expr(shingleExpr))
        .withColumn("si", expr(shingleHashExpr))
        // every HOF column is referenced exactly once below, so each
        // md5 chain still evaluates once per doc (the round-12
        // re-inlining hazard needs multiple references); sub-shingle
        // band guard unchanged
        .select(col("doc_id"),
          coalesce(col("q"), lit(false)).as("q"),
          coalesce(col("r"), lit(false)).as("r"),
          col("grams"),
          concat(lit("x"), md5(col("text").cast("binary"))).as("xval"),
          expr(s"if(size(sh) > 0, $bandArrayExpr, array())").as("bands"),
          size(col("toks")).as("nt"))
        .as[(Long, Boolean, Boolean, Seq[Long], String, Seq[String], Int)]
        .flatMap { case (id, q, r, grams, xval, bands, nt) =>
          val core = StatefulFeatures.BandIn(xval, id) +:
            bands.map(StatefulFeatures.BandIn(_, id))
          if (nt < 2) core
          else {
            // eval docs (every 50th) carry no train verdict, like the
            // batch gate's output; train docs probe the broadcast set
            val dc =
              if (id % 50 == 0) Nil
              else Seq(StatefulFeatures.BandIn(
                if (!grams.exists(bc.value.contains)) "d1" else "d0", id))
            core ++ Seq(
              StatefulFeatures.BandIn(if (q) "q1" else "q0", id),
              StatefulFeatures.BandIn(if (r) "r1" else "r0", id)) ++ dc
          }
        }
    }
    val fusedSink = staged("fused_state") {
      runToMemory(spark,
        StatefulFeatures.bucketFirstUpdate(fusedIn).toDF(), "update",
        "funnelem", stateParts)
    }
    val pfx = substring(col("band_val"), 1, 1)
    val e = fusedSink.filter(pfx === "x")
      .select(col("doc_id"), (col("winner_id") === col("doc_id")).as("e"))
    val m = fusedSink.filter(!pfx.isin("x", "q", "r", "d"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bands"),
        sum(when(col("winner_id") === col("doc_id"), 1L).otherwise(0L))
          .as("n_first"))
      .select(col("doc_id"), (col("n_first") === col("n_bands")).as("m"))
    TextAnalysis.funnelRollup(spark,
      graft.core.Tables.documents(spark, dir),
      fusedSink.filter(pfx === "q")
        .select(col("doc_id"), (col("band_val") === "q1").as("q")),
      fusedSink.filter(pfx === "r")
        .select(col("doc_id"), (col("band_val") === "r1").as("r")),
      e, m,
      fusedSink.filter(pfx === "d")
        .select(col("doc_id"), (col("band_val") === "d1").as("dc0")))
  }

  /** RETRACTION twin of [[dedupMinhashStream]] (round 7): the same
    * MinHash near-dup dedup over a hash-SHUFFLED replay — micro-batches
    * arrive in md5(doc_id) order, so smaller ids genuinely show up
    * after larger ones and the keep-first shortcut is wrong by
    * construction. `bucketMinUpdate` re-emits every affected member
    * when a bucket's winner improves; the sink's max-rev row per
    * (band, doc) is the final verdict, and the rollup matches the SAME
    * order-independent keep-min oracle the ordered stream checks
    * against — now proven under disorder instead of assumed away. */
  def dedupMinhashUpdateStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = bandStreamReplay(spark, dir, nChunks = 4, shuffled = true)
      .select(col("band_val"), col("doc_id"))
      .as[StatefulFeatures.BandIn]
    val out = StatefulFeatures.bucketMinUpdate(in).toDF()
    val sink = runToMemory(spark, out, "update", "minhashupd", LateUpdateParts)
    latestBy(sink, "rev", "band_val", "doc_id")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bands"),
        sum(when(col("winner_id") === col("doc_id"), 1L).otherwise(0L))
          .as("n_first"),
        min(when(col("winner_id") < col("doc_id"), col("winner_id")))
          .as("dup_of_raw"))
      .select(col("doc_id"), col("n_bands"), col("n_first"),
        (col("n_first") < col("n_bands")).as("is_duplicate"),
        coalesce(col("dup_of_raw"), lit(-1L)).as("dup_of"))
      .orderBy(col("doc_id"))
  }

  /** Streaming keep-first dedup (StatefulFeatures.dedupFirstUpdate) in
    * update mode: the sink holds every winner change; read-back takes the
    * max-rev row per (user, type) — what an upsert sink stores — and
    * matches the batch evt_dedup_first oracle exactly. */
  def dedupFirstStateful(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = eventStream(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ems"))
      .as[StatefulFeatures.DedupIn]
    val out = StatefulFeatures.dedupFirstUpdate(in).toDF()
    val sink = runToMemory(spark, out, "update", "dedupfirst")
    latestBy(sink, "rev", "user_id", "event_type")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ems"))
      .orderBy(col("event_id"))
  }

  /** Streaming HLL registers (SketchState.hllRegisters) read back into
    * the SAME estimate/exact tail and DuckDB oracle as the batch
    * sketch_hll_distinct: max-rev register vector per type from the
    * update-mode sink, exploded to seen (bucket, m_j) rows. */
  def hllDistinctStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = graft.queries.Sketches.hllBucketRho(eventStream(spark, dir))
      .select(col("event_type"), col("bucket"), col("rho"))
      .as[SketchState.HllIn]
    val out = SketchState.hllRegisters(in, graft.queries.Sketches.hllM).toDF()
    val sink = runToMemory(spark, out, "update", "hll")
    val regs = latestBy(sink, "rev", "event_type")
      .select(col("event_type"),
        posexplode(col("regs")).as(Seq("bucket", "m_j")))
      .filter(col("m_j") > 0) // zero register == bucket never seen
    graft.queries.Sketches.hllFromRegs(regs,
      graft.core.Tables.events(spark, dir))
  }

  /** Streaming KMV bottom-k sketches (SketchState.kmvBottomK): one
    * ≤64-long sorted array per side (click vs purchase user populations),
    * merged per arrival — commutative/idempotent, so the streamed sketch
    * equals a batch bottom-k over the same data under any chunking. The
    * set-operation finale (Sketches.kmvSetOps) reads the max-rev arrays
    * from the update-mode sink; oracle = Sketches.kmvStreamSql. */
  def kmvStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = eventStream(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        when(col("event_type") === "click", "a").otherwise("b").as("side"),
        conv(substring(md5(col("user_id").cast("string").cast("binary")),
          1, 8), 16, 10).cast("long").as("h"))
      .as[SketchState.KmvIn]
    val out = SketchState.kmvBottomK(in, 64).toDF()
    val sink = runToMemory(spark, out, "update", "kmv")
    val sk = latestBy(sink, "rev", "side")
      .select(col("side"), explode(col("hs")).as("h"))
    graft.queries.Sketches.kmvSetOps(sk)
  }

  /** Streaming bitmap-distinct: the (type, word) partial-OR stage runs as
    * a DECLARATIVE streaming aggregation (bit_or is algebraic — Spark's
    * own state-store agg maintains the words; no custom state machine
    * needed, the point of choosing mergeable sketch encodings), complete
    * mode like the aligned window; the popcount rollup runs as a batch
    * over the sink word table. Same oracle as the batch
    * sketch_bitmap_distinct — OR-merge is micro-batch-split invariant. */
  def bitmapDistinctStream(spark: SparkSession, dir: String): DataFrame = {
    val words = graft.queries.Sketches.bitmapWordsOf(eventStream(spark, dir))
    val sink = runToMemory(spark, words, "complete", "bitmap")
    graft.queries.Sketches.bitmapRollup(sink)
  }

  /** Streaming cumulative-users: native streaming `dropDuplicates` (the
    * engine's own keyed dedup state — not otherwise exercised by the
    * custom keep-first ops) CHAINED with a stateful min aggregation, the
    * multi-stateful-operator pipeline shape. The dedup stage is keyed on
    * the FULL (user_id, day) row, so which duplicate wins is
    * value-irrelevant — deterministic under any partition/arrival order —
    * and it bounds the agg's input to one row per (user, day). Complete
    * mode emits each user's final first-seen day; the day-domain-bounded
    * rollup + running sum is the same batch tail as the batch query. */
  def cumulativeUsersStream(spark: SparkSession, dir: String): DataFrame = {
    val firstSeen = eventStream(spark, dir)
      .select(col("user_id"), expr("ems div 86400000").as("day"))
      .dropDuplicates("user_id", "day")
      .groupBy(col("user_id")).agg(min(col("day")).as("day"))
    val sink = runToMemory(spark, firstSeen, "complete", "cumusers")
    sink.groupBy(col("day")).agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users",
        sum(col("new_users")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("day"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
      .orderBy(col("day"))
  }

  /** The WATERMARK-BOUNDED form of [[cumulativeUsersStream]]'s dedup
    * stage: `dropDuplicatesWithinWatermark` keeps the engine's dedup
    * state only within the watermark horizon — the bounded-state dedup
    * API for unbounded key domains (plain streaming `dropDuplicates`
    * state never evicts). With the replay's 30-day delay every duplicate
    * lands inside the horizon, so the answer matches the unbounded form
    * and shares its oracle. The dedup key (user_id, day) excludes the
    * required event-time column, but the downstream min-aggregation never
    * reads `ts` — which duplicate wins stays value-irrelevant. */
  def cumulativeUsersWmStream(spark: SparkSession, dir: String): DataFrame = {
    val firstSeen = eventStream(spark, dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", ReplayDelay)
      .select(col("user_id"), expr("ems div 86400000").as("day"), col("ts"))
      .dropDuplicatesWithinWatermark("user_id", "day")
      .groupBy(col("user_id")).agg(min(col("day")).as("day"))
    val sink = runToMemory(spark, firstSeen, "complete", "cumuserswm")
    sink.groupBy(col("day")).agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users",
        sum(col("new_users")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("day"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
      .orderBy(col("day"))
  }

  /** Streaming traffic-periodicity monitor: per-minute event counts as a
    * declarative complete-mode aggregation (count is algebraic — the
    * state store maintains one counter per minute), then the
    * exact-integer ACF finale (MetricOps.acfTail) over the final
    * minute table — the live form of evt_acf, same oracle. */
  def acfStream(spark: SparkSession, dir: String): DataFrame = {
    val per = eventStream(spark, dir)
      .select(expr("ems div 60000").as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("c"))
    val sink = runToMemory(spark, per, "complete", "acf")
    graft.queries.MetricOps.acfTail(sink)
  }

  /** Streaming burstiness monitor: per-(type, minute) counts as a
    * declarative complete-mode aggregation, the exact-integer Fano
    * finale (MetricOps.burstinessTail) over the final table — the live
    * form of evt_burstiness, same oracle. */
  def burstinessStream(spark: SparkSession, dir: String): DataFrame = {
    val per = eventStream(spark, dir)
      .select(col("event_type"), expr("ems div 60000").as("m"))
      .groupBy(col("event_type"), col("m")).agg(count(lit(1)).as("c"))
    val sink = runToMemory(spark, per, "complete", "burstiness")
    graft.queries.MetricOps.burstinessTail(sink)
  }

  /** Streaming trend-significance monitor: per-(type, hour) counts as a
    * declarative complete-mode aggregation, then the exact-integer
    * Mann-Kendall finale (AdvancedOps.mannKendallTail) over the final
    * hour table — the live form of evt_mann_kendall, same oracle. */
  def mannKendallStream(spark: SparkSession, dir: String): DataFrame = {
    val per = eventStream(spark, dir)
      .select(col("event_type"), expr("ems div 3600000").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
    val sink = runToMemory(spark, per, "complete", "mannkendall")
    graft.queries.AdvancedOps.mannKendallTail(sink)
  }

  /** Streaming Holt (level, trend) forecaster: per-(type, hour) counts as
    * a declarative complete-mode aggregation, then the exact
    * integer-scaled Holt fold (AdvancedOps.holtTail) over the final hour
    * table — the live form of evt_holt_forecast, same unrolled oracle. */
  def holtStream(spark: SparkSession, dir: String): DataFrame = {
    val per = eventStream(spark, dir)
      .select(col("event_type"), expr("ems div 3600000").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
    val sink = runToMemory(spark, per, "complete", "holt")
    graft.queries.AdvancedOps.holtTail(sink)
  }

  /** Streaming FULL Holt-Winters (level+trend+24h season) forecaster —
    * same complete-mode hour-table state, AdvancedOps.holtWintersTail
    * finale, same 13-CTE unrolled oracle as evt_holt_winters. */
  def holtWintersStream(spark: SparkSession, dir: String): DataFrame = {
    val per = eventStream(spark, dir)
      .select(col("event_type"), expr("ems div 3600000").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
    val sink = runToMemory(spark, per, "complete", "holtwinters")
    graft.queries.AdvancedOps.holtWintersTail(sink)
  }

  /** Streaming level-shift detector: complete-mode hour table +
    * FeatureOps.changepointTail — the live form of evt_changepoint,
    * same oracle. */
  def changepointStream(spark: SparkSession, dir: String): DataFrame = {
    val per = eventStream(spark, dir)
      .select(col("event_type"), expr("ems div 3600000").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
    val sink = runToMemory(spark, per, "complete", "changepoint")
    graft.queries.FeatureOps.changepointTail(sink)
  }

  /** Streaming per-source freshness monitor: per-type count + frontier as
    * a declarative complete-mode aggregation (max/count are algebraic —
    * the engine's state store maintains them), lag/SLA tail over the
    * |types|-row sink. The live form of dq_freshness, same oracle. */
  def freshnessStream(spark: SparkSession, dir: String): DataFrame = {
    val per = eventStream(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("ems")).as("last_ems"))
    val sink = runToMemory(spark, per, "complete", "freshness")
    val g = sink.agg(max(col("last_ems")).as("gmax"))
    sink.crossJoin(broadcast(g))
      .select(col("event_type"), col("n"), col("last_ems"),
        (col("gmax") - col("last_ems")).as("lag_ms"),
        ((col("gmax") - col("last_ems")) > 3600000L).as("is_stale"))
      .orderBy(col("event_type"))
  }

  /** Streaming count-min grid (SketchState.cmsGrid) read back into the
    * SAME probe tail and DuckDB oracle as the batch sketch_cms_topk:
    * max-rev row vector per sketch row from the update-mode sink,
    * exploded to (r, c, cnt) cells. Additive merge, so the streamed grid
    * equals the batch grid under any micro-batch split. */
  def cmsTopkStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.queries.Sketches
    val in = eventStream(spark, dir)
      .select(Sketches.cmsCellsOf(col("user_id")).as("rc"))
      .select(col("rc.r").as("r"), col("rc.c").cast("int").as("c"))
      .as[SketchState.CmsIn]
    val out = SketchState.cmsGrid(in, Sketches.cmsW).toDF()
    val sink = runToMemory(spark, out, "update", "cms")
    val cells = latestBy(sink, "rev", "r")
      .select(col("r"), posexplode(col("counts")).as(Seq("c", "cnt")))
      .filter(col("cnt") > 0)
    Sketches.cmsFromCells(cells, graft.core.Tables.events(spark, dir))
  }

  /** Typed event stream with the replay watermark on the event timestamp,
    * kept as a field so the watermark attribute reaches the stateful
    * operator — the precondition for event-time state timeouts (W4/W11:
    * idle keys age out once the watermark passes frontier + horizon). */
  private def watermarkedEvents(spark: SparkSession, dir: String) = {
    import spark.implicits._
    eventStream(spark, dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(col("event_id"), col("user_id"), col("ems"), col("value"),
        col("ts"))
      .as[StatefulFeatures.EventInTs]
      .withWatermark("ts", ReplayDelay)
  }

  /** M2-streaming: StandardScaler fit statistics as a streaming
    * aggregation — DECIMAL sums/sum-of-squares are associative and
    * mergeable, so the running per-class state is 5 scalars and the
    * complete-mode result after the last batch is bit-identical to the
    * batch fit (same oracle). The z-projection runs on the final 5-row
    * table. */
  def featureScalingStream(spark: SparkSession, dir: String): DataFrame = {
    val s = eventStream(spark, dir)
      .groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("s1"),
        dsum(col("value") * col("value")).as("s2"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
    def std = sqrt((col("s2") - col("s1") * col("s1") / col("n")) /
      (col("n") - 1))
    runToMemory(spark, s, "complete", "featscale")
      .select(col("event_type"), col("n"),
        (col("s1") / col("n")).as("mean"),
        std.as("std"),
        ((col("mn") - col("s1") / col("n")) / std).as("min_z"),
        ((col("mx") - col("s1") / col("n")) / std).as("max_z"))
      .orderBy(col("event_type"))
  }

  /** B11 streaming SCD2 build over the chunked replay: per-user open-
    * version state (4 primitives), closed versions emitted in append
    * mode — result = batch build minus open tails (scd2ClosedSql). */
  def scd2Stream(spark: SparkSession, dir: String,
      nChunks: Int = StatefulReplayChunks): DataFrame = {
    import spark.implicits._
    val in = eventStreamReplay(spark, dir, nChunks)
      .filter(col("user_id") < 40)
      .select(col("event_id"), col("user_id"), col("ems"), col("event_type"))
      .as[StatefulFeatures.Scd2EventIn]
    val out = StatefulFeatures.scd2Intervals(in).toDF()
    runToMemory(spark, out, "append", "scd2")
      .orderBy(col("user_id"), col("version"))
  }

  /** B9 streaming Markov transition matrix: per-user last-event state
    * pairs each arrival with its predecessor (flatMapGroupsWithState,
    * O(1) state per key), then a streaming groupBy(from, to) count in
    * complete mode holds the |types|^2-cell matrix — the result never
    * grows with the corpus. Runs over the 8-chunk time-ordered replay so
    * cross-batch state carry is exercised; row-stochastic probabilities
    * are computed on the final 25-row matrix. Same oracle as the batch
    * evt_markov_transitions. */
  def markovStream(spark: SparkSession, dir: String,
      nChunks: Int = StatefulReplayChunks): DataFrame = {
    import spark.implicits._
    val in = eventStreamReplay(spark, dir, nChunks)
      .select(col("event_id"), col("user_id"), col("ems"), col("event_type"))
      .as[StatefulFeatures.MarkovEventIn]
    val agg = StatefulFeatures.markovTransitions(in)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    runToMemory(spark, agg.toDF(), "complete", "markov")
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("from_type"))).cast("double"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Streaming EWMA features: per-user O(1) decayed-average state over
    * the 8-chunk time-ordered replay, per-event emission in append mode;
    * the final row per key (max n — n is strictly increasing per user)
    * is the served feature and is bit-identical to the batch fold (same
    * oracle as evt_ewma). */
  def ewmaStream(spark: SparkSession, dir: String,
      nChunks: Int = StatefulReplayChunks): DataFrame = {
    import spark.implicits._
    val in = eventStreamReplay(spark, dir, nChunks)
      .select(col("event_id"), col("user_id"), col("ems"), col("value"))
      .as[StatefulFeatures.EwmaEventIn]
    val out = StatefulFeatures.ewmaSteps(in).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    runToMemory(spark, out, "append", "ewma")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
      .orderBy(col("user_id"))
  }

  /** Streaming OLS trend slope: per-user 5-long moment state over the
    * replay (order-independent — integer sums commute), final per-key
    * moments finalized through the SAME exact-integer closed form as the
    * batch query (graft.queries.FeatureOps.trendFinalize; same oracle as
    * evt_trend_slope). */
  def trendSlopeStream(spark: SparkSession, dir: String,
      nChunks: Int = StatefulReplayChunks): DataFrame = {
    import spark.implicits._
    val in = eventStreamReplay(spark, dir, nChunks)
      .select(col("event_id"), col("user_id"), col("ems"), col("value"))
      .as[StatefulFeatures.TrendEventIn]
    val out = StatefulFeatures.trendSteps(in).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n").desc)
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val finalRows = runToMemory(spark, out, "append", "trend")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("n"),
        col("sx").cast(d38).as("sx"), col("sy").cast(d38).as("sy"),
        col("sxy").cast(d38).as("sxy"), col("sxx").cast(d38).as("sxx"))
    graft.queries.FeatureOps.trendFinalize(finalRows)
  }

  /** Streaming seasonality monitor: the 120-row (type, hour-of-day)
    * baseline is trained batch-side and broadcast into the replay stream
    * (stream-static join — the feature-store enrichment shape); residual
    * anomaly counts accumulate additively in complete mode (in-flight
    * state ≤ 120 rows, order-free). Same oracle as evt_seasonality. */
  /** Replay cadence for the COMPLETE-MODE additive monitors
    * (seasonality / winsorize / A-B): their aggregates are commutative
    * sums over the row multiset, so the final complete-mode table is
    * chunk-count invariant BY ALGEBRA (unlike the append-mode state
    * ops, whose within-batch tie reconciliation makes chunking
    * semantic). PartsSweep `monitors` grid (median-of-3 warm, sf0.1,
    * table in ARCHITECTURE.md) — same multiplying per-batch fixed cost
    * as the interval join; 2 batches still demonstrate cross-batch
    * accumulation. */
  private[graft] val MonitorReplayChunks = 2

  /** Replay cadence for the per-key APPEND-MODE stateful family
    * (trend / markov / ewma / brown / scd2 / the aligned append window /
    * dynamic sessions) — round 14, verdict r13 #1. Chunk-count
    * invariance here is NOT the monitors' commutative-sum algebra; it
    * rests on the replay's ORDER CONTRACT: `eventStreamReplay`
    * range-partitions on (ts, event_id) and each op sorts its
    * micro-batch by (ems, event_id), so the concatenated per-key fold
    * order is the same global (time, id) walk at ANY chunk count — a
    * chunk boundary can only fall between two events the op would have
    * processed in that order anyway. (The windowed/session members are
    * invariant the simpler way: commutative window sums + the
    * data-determined final watermark frontier.) Swept over {2, 4, 8}
    * (PartsSweep `statefuls` grid, median-of-3 warm at sf0.1, table in
    * ARCHITECTURE.md): the per-batch fixed cost — every micro-batch
    * commits every state store in every partition — dominates per-row
    * work at verify scale, same as the interval-join grid; 2 batches
    * still exercise genuine cross-batch state carry (trend moments,
    * the Markov predecessor, EWMA level, open SCD2 versions, unsealed
    * windows all cross the boundary). At 100× data per-row work
    * dominates and the knob turns the other way — this is the
    * verify-scale pin, not a constant. Measured (sweep, sf0.1): 2
    * chunks beat 8 on every member, 1.9–2.9× — e.g. markov 4.77→1.66,
    * trend 3.54→1.58, aligned append 3.82→2.40, scd2 2.95→1.15. */
  private[graft] val StatefulReplayChunks = 2

  /** Replay cadence for the STATELESS doc-replay gates (exact + fuzzy
    * decontamination, bloom, DSIR, LM-score, CCNet, winnowing): each doc's
    * verdict is a pure function of the doc row and a batch-trained
    * broadcast model — no state store, no watermark, no cross-row
    * dependence — so the output multiset is chunk-count invariant by
    * construction and multi-trigger replay only adds per-batch commit
    * fixed cost plus (for the gates with a stream-static or broadcast
    * training side) one re-execution of the static plan per extra batch.
    * This is the in-tree precedent the corpus funnel's stateless pass
    * has used since round 10 (`curationFunnelStream` runs its gate pass
    * at nChunks = 1 for exactly this reason). Swept over {1, 2, 4}
    * (PartsSweep `docgates` grid, median-of-3 warm at sf0.1, table in
    * ARCHITECTURE.md). The STATEFUL band/doc consumers (minhash dedup,
    * incremental dedup, phash dedup) are NOT on this pin — their
    * keep-first/retraction state story needs ≥2 batches; they take the
    * separate `bandstate` sweep. */
  private[graft] val GateReplayChunks = 1

  def seasonalityStream(spark: SparkSession, dir: String,
                        nChunks: Int = MonitorReplayChunks): DataFrame = {
    // train ONCE, then join the materialized 120 rows: a stream-static
    // join re-executes the static side's plan every micro-batch, so an
    // un-checkpointed full-scan aggregate here ran 8x per invocation
    // (round 13 — the production semantics is train-once anyway)
    val base = graft.queries.FeatureOps.seasonalityBase(spark, dir)
      .localCheckpoint(true)
    val in = eventStreamReplay(spark, dir, nChunks)
      .withColumn("hod", expr("(ems div 3600000) % 24"))
    val agg = in.join(broadcast(base), Seq("event_type", "hod"))
      .groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("value") - col("mean_value")) > 40.0, 1L)
          .otherwise(0L)).as("n_anomalies"))
    runToMemory(spark, agg, "complete", "seasonal")
      .join(broadcast(base), Seq("event_type", "hod"))
      .select(col("event_type"), col("hod"), col("n"), col("mean_value"),
        col("n_anomalies"))
      .orderBy(col("event_type"), col("hod"))
  }

  /** Streaming winsorization: per-type [p05, p95] cut points trained
    * batch-side and broadcast into the replay; clip counts and the
    * DECIMAL-exact winsorized sum accumulate additively in complete mode
    * (decimal addition is exact and commutative — arrival order cannot
    * matter). Same oracle as quality_winsorize. */
  def winsorizeStream(spark: SparkSession, dir: String,
                      nChunks: Int = MonitorReplayChunks): DataFrame = {
    // train ONCE: the percentile cuts are a sort-heavy full-table
    // aggregate, and the stream-static join re-executed it per
    // micro-batch — 9 runs per invocation made this the suite-worst
    // median (9.9 s) in the round-13 bench; checkpointed it is ~4 s
    // at 8 chunks (the remaining cost is the replay's per-batch fixed
    // commits — the MonitorReplayChunks sweep)
    val cuts = graft.queries.AdvancedOps.winsorizeCuts(spark, dir)
      .localCheckpoint(true)
    val in = eventStreamReplay(spark, dir, nChunks)
    val agg = in.join(broadcast(cuts), Seq("event_type"))
      .withColumn("w", least(greatest(col("value"), col("p05")), col("p95")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") < col("p05"), 1L).otherwise(0L))
          .as("n_clipped_low"),
        sum(when(col("value") > col("p95"), 1L).otherwise(0L))
          .as("n_clipped_high"),
        sum(col("w").cast(org.apache.spark.sql.types.DecimalType(25, 6)))
          .as("sum_dec"))
    runToMemory(spark, agg, "complete", "winsor")
      .join(broadcast(cuts), Seq("event_type"))
      .select(col("event_type"), col("n"), col("n_clipped_low"),
        col("n_clipped_high"), col("p05"), col("p95"),
        col("sum_dec").cast("double").as("sum_winsorized"))
      .orderBy(col("event_type"))
  }

  /** Streaming A/B monitor: stateless (variant, conversion) map, 4
    * additive counters in complete mode (in-flight state = 1 row), the
    * z-test closed form applied to the final counts via the SAME
    * expressions as the batch query — the live experiment readout (same
    * oracle as ml_ab_test). Order never matters: counts are additive. */
  def abTestStream(spark: SparkSession, dir: String,
                   nChunks: Int = MonitorReplayChunks): DataFrame = {
    val in = eventStreamReplay(spark, dir, nChunks)
    val agg = in.select((col("user_id") % 2).as("variant"),
        when(col("value") > 75.0, 1L).otherwise(0L).as("conv"))
      .groupBy()
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("variant") === 0, col("conv")).otherwise(0L)).as("c0"),
        sum(when(col("variant") === 1, col("conv")).otherwise(0L)).as("c1"))
    val m = runToMemory(spark, agg, "complete", "abtest")
    val p0 = col("c0").cast("double") / col("n0").cast("double")
    val p1 = col("c1").cast("double") / col("n1").cast("double")
    val pp = (col("c0") + col("c1")).cast("double") /
      (col("n0") + col("n1")).cast("double")
    m.select(col("n0"), col("n1"), col("c0"), col("c1"),
      p0.as("p0"), p1.as("p1"),
      ((p1 - p0) /
        sqrt(pp * (lit(1.0) - pp) *
          (lit(1.0) / col("n0").cast("double") +
           lit(1.0) / col("n1").cast("double")))).as("z"))
  }

  /** Streaming Brown double-smoothing features: per-user 4-primitive
    * (s₁, s₂) state over the time-ordered replay; the final per-key row
    * finalized with the SAME level/trend/forecast expressions as the
    * batch query (same oracle as evt_brown_forecast). */
  def brownStream(spark: SparkSession, dir: String,
      nChunks: Int = StatefulReplayChunks): DataFrame = {
    import spark.implicits._
    val in = eventStreamReplay(spark, dir, nChunks)
      .select(col("event_id"), col("user_id"), col("ems"), col("value"))
      .as[StatefulFeatures.BrownEventIn]
    val out = StatefulFeatures.brownSteps(in).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    runToMemory(spark, out, "append", "brown")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
      .select(col("user_id"), col("n_events"),
        (lit(2.0) * col("s1") - col("s2")).as("level"),
        ((col("s1") - col("s2")) / lit(3.0)).as("trend"),
        ((lit(2.0) * col("s1") - col("s2")) +
          (col("s1") - col("s2")) / lit(3.0)).as("forecast_1"))
      .orderBy(col("user_id"))
  }

  /** Streaming cooldown dedup (throttle): per-user 3-primitive state over
    * the time-ordered replay; final per-key row (max n_events) equals the
    * batch greedy fold (same oracle as evt_throttle). */
  def throttleStream(spark: SparkSession, dir: String,
      nChunks: Int = StatefulReplayChunks): DataFrame = {
    import spark.implicits._
    val in = eventStreamReplay(spark, dir, nChunks)
      .select(col("event_id"), col("user_id"), col("ems"))
      .as[StatefulFeatures.ThrottleEventIn]
    val out = StatefulFeatures.throttleSteps(in).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    runToMemory(spark, out, "append", "throttle")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
      .orderBy(col("user_id"))
  }

  /** Streaming token-bucket limiter: per-user 4-primitive state over the
    * time-ordered replay; final per-key row equals the batch fold (same
    * oracle as evt_token_bucket). */
  def tokenBucketStream(spark: SparkSession, dir: String,
      nChunks: Int = StatefulReplayChunks): DataFrame = {
    import spark.implicits._
    val in = eventStreamReplay(spark, dir, nChunks)
      .select(col("event_id"), col("user_id"), col("ems"))
      .as[StatefulFeatures.ThrottleEventIn]
    val out = StatefulFeatures.tokenBucketSteps(in).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    runToMemory(spark, out, "append", "tokenbucket")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
      .select(col("user_id"), col("n_events"), col("n_allowed"),
        (col("n_events") - col("n_allowed")).as("n_denied"),
        col("final_tokens_ms"))
      .orderBy(col("user_id"))
  }

  /** Streaming CUSUM level-shift monitor: per-user 5-primitive integer
    * state over the time-ordered replay; final per-key row equals the
    * batch DECIMAL window algebra (same oracle as evt_cusum). The micro
    * quantization runs through the SAME decimal(25,6) cast as the batch
    * query — scaled by 10⁶ into longs — and the max excursion converts
    * back through exact decimal division so the double is bit-equal to
    * the batch decimal→double cast. */
  def cusumStream(spark: SparkSession, dir: String,
      nChunks: Int = StatefulReplayChunks): DataFrame = {
    import spark.implicits._
    val in = eventStreamReplay(spark, dir, nChunks)
      .select(col("event_id"), col("user_id"), col("ems"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(25, 6)) *
          lit(1000000)).cast("long").as("micro"))
      .as[StatefulFeatures.CusumIn]
    val out = StatefulFeatures.cusumSteps(in).toDF()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    runToMemory(spark, out, "append", "cusum")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
      .select(col("user_id"), col("n_events"), col("n_alarms"),
        expr("cast(cast(max_pos_micro as decimal(31,6)) / 1000000" +
          " as decimal(25,6))").cast("double").as("max_cusum"))
      .orderBy(col("user_id"))
  }

  /** M11 streaming PSI: the reference decile profile is fixed, so it is
    * trained batch-side and inlined as an array literal (the broadcast-
    * centroid pattern); the stream does a stateless bucket map + an
    * additive (bucket × window) count in complete mode — in-flight state
    * is ≤ 10 rows and order never matters. The final epsilon-clamped fold
    * runs on the 10-row result via the SAME rollup as the batch query
    * (bit-identical doubles, same oracle). */
  def psiStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.DriftQuality
    val edgeArr = DriftQuality.psiEdges(spark, dir)
      .head().getSeq[Double](0)
    val edgesLit = array(edgeArr.map(lit(_)): _*)
    val b = eventStream(spark, dir)
      .withColumn("is_ref",
        (col("ems") < DriftQuality.cutoffMs).cast("int"))
      .withColumn("bucket",
        size(filter(edgesLit, e => e < col("value"))))
      .groupBy(col("bucket"))
      .agg(sum(col("is_ref")).cast("long").as("ref_n"),
        sum(lit(1) - col("is_ref")).cast("long").as("cur_n"))
    val counts = runToMemory(spark, b, "complete", "psistream")
    DriftQuality.psiRollup(counts)
  }

  /** Streaming MMD kernel-drift monitor: the six per-type moments the
    * closed-form MMD² needs are plain mergeable sums, so the kernel
    * two-sample test runs as a COMPLETE-mode aggregation (|types| groups
    * of 6 longs) with the SAME moment/finale code as the batch query —
    * the moment collapse that makes a kernel method streamable at all.
    * Oracle = the batch SQL verbatim (DriftQuality.mmdPolySql). */
  def mmdStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.DriftQuality
    val e = eventStream(spark, dir)
      .withColumn("is_ref",
        (col("ems") < DriftQuality.cutoffMs).cast("int"))
    val mo = DriftQuality.mmdMoments(e)
    val sink = runToMemory(spark, mo, "complete", "mmdstream")
    DriftQuality.mmdFromMoments(sink)
  }

  /** Streaming diff-in-diff monitor: the 2×2 (treat, post) cells are
    * mergeable counts, so the DiD estimate runs as a complete-mode
    * aggregation with FOUR groups of state; the pre/post midpoint trains
    * batch-side and broadcasts as the gate's constant (the threshold
    * contract — a stream cannot know its own max timestamp). Shared
    * didFromCells finale; oracle = the batch SQL verbatim. */
  def diffInDiffStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.AnalyticsOps
    val mid = AnalyticsOps.didMidpoint(spark, dir)
    val cells = eventStream(spark, dir)
      .select(col("ems"),
        when(col("user_id") % 2 === 0, 1L).otherwise(0L).as("treat"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .withColumn("post", when(col("ems") >= mid, 1L).otherwise(0L))
      .groupBy(col("treat"), col("post"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
    val sink = runToMemory(spark, cells, "complete", "didstream")
    AnalyticsOps.didFromCells(sink)
  }

  /** Streaming Brier-decomposition monitor: per-score (n, pos) bins are
    * mergeable counts — a complete-mode aggregation with |scores| groups
    * of state — and the Murphy finale is the same shared code as the
    * batch query; oracle = the batch SQL verbatim. */
  def brierStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.AdvancedOps
    val bins = AdvancedOps.brierBins(eventStream(spark, dir))
    val sink = runToMemory(spark, bins, "complete", "brierstream")
    AdvancedOps.brierFromBins(sink)
  }

  /** Streaming Expected-Calibration-Error monitor (round 12): the same
    * mergeable per-score (n, pos) bins as [[brierStream]] in complete
    * mode, closed by the shared micro-int ECE finale; oracle = the batch
    * SQL verbatim. The production shape: a live model-calibration gauge
    * from |scores| groups of state. */
  def eceStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.AdvancedOps
    val bins = AdvancedOps.brierBins(eventStream(spark, dir))
    val sink = runToMemory(spark, bins, "complete", "ecestream")
    AdvancedOps.eceFromBins(sink)
  }

  /** W5 per-event session steps (the Flink MapState clickstream path):
    * constant-size running session state per key, one output row per
    * event. */
  def sessionStepsStateful(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = eventStream(spark, dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(col("event_id"), col("user_id"), col("ems"), col("event_type"),
        col("ts"))
      .as[StatefulFeatures.SessEventInTs]
      .withWatermark("ts", ReplayDelay)
    val out = StatefulFeatures.sessionStepsExpiring(in).toDF()
    runToMemory(spark, out, "append", "sessionsteps").orderBy(col("event_id"))
  }

  /** W3 full stat set (A2/A3/A6/A7/A12 per-event): same oracle as the
    * batch evt_anchored_stats_24h query — the streaming computation of
    * the reference's core feature vector, bit-identical to the
    * declarative form. */
  def anchoredStatsStateful(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = watermarkedEvents(spark, dir)
    val out = StatefulFeatures.anchoredStatsExpiring(in).toDF()
    runToMemory(spark, out, "append", "anchoredstats").orderBy(col("event_id"))
  }
}
