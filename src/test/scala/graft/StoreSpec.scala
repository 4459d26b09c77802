package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.store._
import graft.streaming.StoreSink

/** Feature-store semantics: idempotent merge, PIT consistency validation,
  * and the streaming foreachBatch sink. */
class StoreSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val view = FeatureView(
    "spec_view", Seq(Registry.user), ttlMs = 1000L,
    schema = StructType(Seq(StructField("v", DoubleType))))

  private def newStore() =
    new OnlineStore(spark, Files.createTempDirectory("graft_spec_store_").toString)

  private def rows(t: (Long, Long, Double)*) =
    t.toSeq.toDF("user_id", "feature_timestamp", "v")
      .withColumn("computation_timestamp", col("feature_timestamp"))

  test("upsert keeps latest per key; replayed batch is a no-op; history keeps all") {
    val store = newStore()
    store.upsert(view, rows((1L, 100L, 1.0), (2L, 100L, 2.0)), 0L)
    store.upsert(view, rows((1L, 200L, 9.0)), 1L)
    store.upsert(view, rows((1L, 200L, 9.0)), 1L) // replay
    val online = store.getOnlineFeatures(view, Seq(1L, 2L).toDF("user_id"))
      .select($"user_id", $"v").as[(Long, Double)].collect().toMap
    assert(online == Map(1L -> 9.0, 2L -> 2.0))
    assert(store.history(view).count() == 3L) // replay not double-appended
  }

  test("bucketed upsert rewrites only touched buckets (cost ∝ batch, not store)") {
    val root = Files.createTempDirectory("graft_bucket_store_").toString
    val store = new OnlineStore(spark, root)
    store.upsert(view, rows((1L to 200L).map(i => (i, 100L, i.toDouble)): _*), 0L)
    store.upsert(view, rows((1L, 200L, 9.0)), 1L) // one key -> one bucket
    def bucketDirs(version: String) = {
      val d = new java.io.File(s"$root/online/spec_view/$version")
      d.listFiles().count(_.getName.startsWith("gbucket="))
    }
    assert(bucketDirs("v0") > 1)   // 200 keys spread over many buckets
    assert(bucketDirs("v1") == 1)  // batch 2 rewrote exactly its bucket
    // the mixed-version snapshot still reads back complete and correct
    val online = store
      .getOnlineFeatures(view, (1L to 200L).toDF("user_id"))
      .select($"user_id", $"v").as[(Long, Double)].collect().toMap
    assert(online.size == 200)
    assert(online(1L) == 9.0 && online(2L) == 2.0 && online(200L) == 200.0)
  }

  test("replay after crash between manifest flip and marker is a safe no-op") {
    val root = Files.createTempDirectory("graft_crash_store_").toString
    val store = new OnlineStore(spark, root)
    store.upsert(view, rows((1L, 100L, 1.0), (2L, 100L, 2.0)), 0L)
    store.upsert(view, rows((1L, 200L, 9.0)), 1L)
    // simulate the crash: manifest flipped to v1 but the marker was lost
    Files.delete(java.nio.file.Paths.get(s"$root/_batches/spec_view/1"))
    store.upsert(view, rows((1L, 200L, 9.0)), 1L) // must not read-while-overwrite
    val online = store.getOnlineFeatures(view, Seq(1L, 2L).toDF("user_id"))
      .select($"user_id", $"v").as[(Long, Double)].collect().toMap
    assert(online == Map(1L -> 9.0, 2L -> 2.0))
    assert(Files.exists(java.nio.file.Paths.get(s"$root/_batches/spec_view/1")))
  }

  test("TTL expires stale online rows; untouched buckets keep their version") {
    val root = Files.createTempDirectory("graft_ttl_store_").toString
    val store = new OnlineStore(spark, root)
    store.upsert(view, rows((1L, 100L, 1.0), (2L, 5000L, 2.0)), 0L)
    store.applyTtl(view, nowMs = 5500L) // ttl 1000 -> keep fts >= 4500
    val left = store.getOnlineFeatures(view, Seq(1L, 2L).toDF("user_id"))
      .filter($"v".isNotNull).select($"user_id").as[Long].collect().toSet
    assert(left == Set(2L))
    // min-timestamp pruning: only user 1's bucket (min 100 < cutoff) was
    // rewritten; user 2's bucket still references the ORIGINAL version
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/online/spec_view/_latest")))
    assert(manifest.contains("=v0:5000"), s"untouched bucket rewritten:\n$manifest")
    assert(manifest.contains("=ttl5500:"), s"expired bucket not rewritten:\n$manifest")
  }

  test("min-stat lower bound is TTL-safe and self-corrects (round-7 pre-pass)") {
    // upsert maintains the manifest stat as min(prev, batch) WITHOUT a
    // read-back — a LOWER BOUND that can go stale-low when a key update
    // removes the oldest row. Stale-low must only ever cause an extra
    // TTL rewrite (never a skipped one), and that rewrite records the
    // exact min, after which an identical TTL pass writes nothing.
    val root = Files.createTempDirectory("graft_minstat_store_").toString
    val store = new OnlineStore(spark, root)
    store.upsert(view, rows((1L, 100L, 1.0)), 0L)
    // key update: the ts=100 row is superseded; true online min is now
    // 6000, but the manifest stat stays min(100, 6000) = 100
    store.upsert(view, rows((1L, 6000L, 2.0)), 1L)
    val manifest1 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/online/spec_view/_latest")))
    assert(manifest1.contains("=v1:100"),
      s"expected stale-low lower bound in manifest:\n$manifest1")
    // cutoff 4500 sits between the stale bound and the true min: the
    // stale stat forces a rewrite (safe direction), nothing expires,
    // and the pass records the exact min
    store.applyTtl(view, nowMs = 5500L)
    val online = store.getOnlineFeatures(view, Seq(1L).toDF("user_id"))
      .select($"v").as[Double].collect().toSeq
    assert(online == Seq(2.0), "TTL rewrite must not drop unexpired rows")
    val manifest2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/online/spec_view/_latest")))
    assert(manifest2.contains("=ttl5500:6000"),
      s"TTL rewrite did not record the exact min:\n$manifest2")
    // self-corrected: the same cutoff now prunes — no new version appears
    store.applyTtl(view, nowMs = 5500L)
    val manifest3 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/online/spec_view/_latest")))
    assert(manifest3 == manifest2,
      "second identical TTL pass must be a pruned no-op")
  }

  test("version GC removes unreferenced snapshots; TTL orphans are swept") {
    val root = Files.createTempDirectory("graft_gc_store_").toString
    // gcGraceMs = 0 is the OPT-IN immediate-deletion contract (round 6:
    // the default is a 10 min retention window)
    val store = new OnlineStore(spark, root, gcGraceMs = 0L)
    def versions = new java.io.File(s"$root/online/spec_view").listFiles()
      .filter(_.isDirectory).map(_.getName).filterNot(_.startsWith("_")).toSet
    store.upsert(view, rows((1L to 50L).map(i => (i, 100L, i.toDouble)): _*), 0L)
    store.upsert(view, rows((1L, 200L, 9.0)), 1L)
    // v0 is still referenced for the untouched buckets -> both live
    assert(versions == Set("v0", "v1"))
    // rewrite EVERY key: v0/v1 drop out of the manifest -> collected
    store.upsert(view, rows((1L to 50L).map(i => (i, 300L, i.toDouble)): _*), 2L)
    assert(versions == Set("v2"))
    // a crashed TTL run leaves an orphan version (written, never flipped);
    // the next TTL run sweeps it — and with nothing expired (cutoff
    // before every min-timestamp stat) it rewrites NOTHING: the manifest
    // keeps v2 and the orphan is the only disk change
    Files.createDirectories(
      java.nio.file.Paths.get(s"$root/online/spec_view/ttl999/gbucket=0"))
    store.applyTtl(view, nowMs = 400L)
    assert(versions == Set("v2"))
    val alive = store.getOnlineFeatures(view, (1L to 50L).toDF("user_id"))
      .filter($"v".isNotNull).count()
    assert(alive == 50L)
    // a TTL that does expire rows publishes its pruned version and GCs
    store.applyTtl(view, nowMs = 1400L) // cutoff 400 -> all rows (ts 300) expire
    assert(versions == Set("ttl1400"))
    assert(store.online(view).count() == 0L) // fully-expired store is empty
  }

  test("history compaction shrinks files, preserves content, keeps replays no-ops") {
    val root = Files.createTempDirectory("graft_compact_store_").toString
    val store = new OnlineStore(spark, root)
    (0L to 3L).foreach(b =>
      store.upsert(view, rows((1L to 40L).map(i => (i, 100L * (b + 1), i.toDouble)): _*), b))
    def parquetFiles = {
      val d = java.nio.file.Paths.get(s"$root/history/spec_view")
      java.nio.file.Files.walk(d).filter(_.toString.endsWith(".parquet"))
        .count().toInt
    }
    val before = store.history(view).collect().map(_.toString).sorted.toSeq
    val filesBefore = parquetFiles
    store.compactHistory(view)
    assert(parquetFiles < filesBefore)
    assert(parquetFiles <= 4) // one file per batch partition
    val after = store.history(view).collect().map(_.toString).sorted.toSeq
    assert(after == before)
    // a replayed batch whose directory was rewritten is still a no-op
    store.upsert(view, rows((1L, 100L, 1.0)), 2L)
    assert(store.history(view).count() == before.size.toLong)
    // crash self-heal: a stale _compact_old_ dir (interrupted deletion
    // walk of a prior run) must not fail the next compaction's renames
    Files.createDirectories(java.nio.file.Paths
      .get(s"$root/history/_compact_old_spec_view/batch=0"))
    store.compactHistory(view)
    assert(store.history(view).collect().map(_.toString).sorted.toSeq == before)
    assert(!Files.exists(
      java.nio.file.Paths.get(s"$root/history/_compact_old_spec_view")))
  }

  test("as-of read reproduces the log state; ttlAsOfMs replays the TTL clock") {
    val store = newStore()
    store.upsert(view, rows((1L, 100L, 1.0)), 0L)
    store.upsert(view, rows((1L, 300L, 9.0), (2L, 5000L, 2.0)), 1L)
    // as of batch 0: the later batch does not exist yet
    val asOf0 = store.onlineAsOf(view, 0L)
      .select($"user_id", $"v").as[(Long, Double)].collect().toMap
    assert(asOf0 == Map(1L -> 1.0))
    store.applyTtl(view, nowMs = 5500L)
    // TTL is cache maintenance, not a log event: the plain as-of read
    // resurrects the expired row (documented), the replayed clock does not
    assert(store.onlineAsOf(view, 1L).count() == 2L)
    val ttld = store.onlineAsOf(view, 1L, ttlAsOfMs = Some(5500L))
      .select($"user_id").as[Long].collect().toSet
    assert(ttld == Set(2L))
  }

  test("PIT validator flags inconsistency and passes consistent stores") {
    val store = newStore()
    store.upsert(view, rows((1L, 100L, 1.0), (1L, 200L, 2.0)), 0L)
    val ok = HistoricalStore.validateConsistency(
      store.online(view), store.history(view), view, "v")
    assert(ok.count() == 0L)
    // corrupt the online value -> violation surfaces
    val bad = store.history(view).filter($"feature_timestamp" === 200L)
      .withColumn("v", lit(99.0))
    val viol = HistoricalStore.validateConsistency(
      bad, store.history(view), view, "v")
    assert(viol.count() == 1L)
    // online row with NO historical match at its timestamp is a violation,
    // not a silent pass
    val orphan = rows((9L, 50L, 7.0))
    val viol2 = HistoricalStore.validateConsistency(
      orphan, store.history(view), view, "v")
    assert(viol2.count() == 1L)
  }

  test("default store: pinned pre-upsert reader survives a later upsert") {
    // the round-6 DEFAULT posture (gcGraceMs = 10 min, Delta-style
    // retention): no opt-in needed for a pinned reader to outlive a flip
    val root = Files.createTempDirectory("graft_default_store_").toString
    val store = new OnlineStore(spark, root)
    store.upsert(view, rows((1L, 100L, 1.0), (2L, 100L, 2.0)), 0L)
    val pinned = store.online(view) // resolves v0's concrete bucket paths
    store.upsert(view, rows((1L, 200L, 9.0), (2L, 200L, 8.0)), 1L)
    val got = pinned.select($"user_id", $"v").as[(Long, Double)]
      .collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 2.0))
    val online = store.getOnlineFeatures(view, Seq(1L, 2L).toDF("user_id"))
      .select($"user_id", $"v").as[(Long, Double)].collect().toMap
    assert(online == Map(1L -> 9.0, 2L -> 8.0))
  }

  test("retention GC: pinned pre-upsert reader survives the grace window") {
    val root = Files.createTempDirectory("graft_retention_store_").toString
    var now = 1000000L
    val store = new OnlineStore(spark, root, gcGraceMs = 60000L,
      clock = () => now)
    store.upsert(view, rows((1L, 100L, 1.0), (2L, 100L, 2.0)), 0L)
    val pinned = store.online(view) // resolves v0's concrete bucket paths
    store.upsert(view, rows((1L, 200L, 9.0), (2L, 200L, 8.0)), 1L)
    // v0 is unreferenced but inside the grace window: the pinned reader
    // still collects the pre-upsert state (with gcGraceMs=0 this throws)
    val got = pinned.select($"user_id", $"v").as[(Long, Double)]
      .collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 2.0))
    assert(Files.exists(java.nio.file.Paths.get(s"$root/online/spec_view/v0")))
    // lapse the window; GC rides the next upsert and deletes v0
    now += 61000L
    store.upsert(view, rows((1L, 300L, 7.0)), 2L)
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/online/spec_view/v0")))
    val online = store.getOnlineFeatures(view, Seq(1L, 2L).toDF("user_id"))
      .select($"user_id", $"v").as[(Long, Double)].collect().toMap
    assert(online == Map(1L -> 7.0, 2L -> 8.0))
  }

  test("compactHistory retains the pre-compaction copy for the grace window") {
    val root = Files.createTempDirectory("graft_retire_store_").toString
    var now = 1000000L
    val store = new OnlineStore(spark, root, gcGraceMs = 60000L,
      clock = () => now)
    store.upsert(view, rows((1L, 100L, 1.0)), 0L)
    store.upsert(view, rows((1L, 200L, 2.0)), 1L)
    store.compactHistory(view)
    def retired() = new java.io.File(s"$root/history").listFiles()
      .filter(_.getName.startsWith("_compact_retired_spec_view_"))
    assert(retired().length == 1)
    assert(store.history(view).count() == 2L)
    now += 61000L
    store.compactHistory(view) // start-of-run sweep removes the lapsed copy
    val after = retired()
    assert(after.length == 1 && after.head.getName
      .stripPrefix("_compact_retired_spec_view_").toLong == now)
    assert(store.history(view).count() == 2L)
  }

  test("service-level read joins multiple views without column collisions") {
    val store = newStore()
    val view2 = FeatureView("spec_view2", Seq(Registry.user), ttlMs = 1000L,
      schema = view.schema)
    store.upsert(view, rows((1L, 100L, 1.0)), 0L)
    store.upsert(view2, rows((1L, 100L, 2.0))
      .withColumnRenamed("v", "w"), 0L)
    val svc = FeatureService("svc", Seq(view, view2))
    val out = store.getOnlineFeatures(svc, Seq(1L).toDF("user_id"))
    assert(out.columns.count(_.contains("feature_timestamp")) == 2)
    assert(out.columns.distinct.length == out.columns.length)
    val row = out.head()
    assert(row.getAs[Double]("v") == 1.0 && row.getAs[Double]("w") == 2.0)
  }

  test("streaming foreachBatch sink upserts micro-batches into the store") {
    implicit val ctx = spark.sqlContext
    val store = newStore()
    val in = MemoryStream[(Long, Long, Double)]
    val feats = in.toDF().toDF("user_id", "feature_timestamp", "v")
      .withColumn("computation_timestamp", col("feature_timestamp"))
    val cp = Files.createTempDirectory("graft_cp_").toString
    val q = StoreSink.writeTo(feats, store, view, cp)
    try {
      in.addData((1L, 100L, 1.0))
      q.processAllAvailable()
      in.addData((1L, 300L, 3.0), (2L, 300L, 4.0))
      q.processAllAvailable()
    } finally q.stop()
    val online = store.getOnlineFeatures(view, Seq(1L, 2L).toDF("user_id"))
      .select($"user_id", $"v").as[(Long, Double)].collect().toMap
    assert(online == Map(1L -> 3.0, 2L -> 4.0))
  }

  test("erase removes keys from disk (snapshot + history + superseded versions), others intact") {
    val root = Files.createTempDirectory("graft_erase_store_").toString
    val store = new OnlineStore(spark, root) // default 10-min grace
    store.upsert(view, rows((1L, 100L, 1.0), (2L, 100L, 2.0),
      (3L, 100L, 3.0)), 0L)
    store.upsert(view, rows((1L, 200L, 9.0), (4L, 200L, 4.0)), 1L)
    store.erase(view, Seq(1L).toDF("user_id"), "t1")
    // raw on-disk sweep, NOT through the store's read path: no parquet
    // file anywhere under the view may still hold user 1
    def allRows() = {
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      val parquets =
        try {
          import scala.jdk.CollectionConverters._
          files.iterator().asScala
            .filter(p => p.toString.endsWith(".parquet")).map(_.toString).toList
        } finally files.close()
      spark.read.parquet(parquets: _*).select($"user_id").as[Long].collect()
    }
    val survivors = allRows()
    assert(!survivors.contains(1L), "erased key still on disk")
    assert(survivors.toSet == Set(2L, 3L, 4L))
    // NB the raw sweep above is the strong claim: it catches both
    // grace-retained superseded versions AND stale gbucket= subdirs left
    // inside versions still live for OTHER buckets (the shared-version
    // leak this spec originally found)
    // read paths agree: online, point lookup, and time travel all erased
    assert(store.online(view).filter($"user_id" === 1L).isEmpty)
    assert(store.onlineAsOf(view, 1L).filter($"user_id" === 1L).isEmpty)
    // other keys' serving values untouched
    val online = store.getOnlineFeatures(view, Seq(2L, 3L, 4L).toDF("user_id"))
      .select($"user_id", $"v").as[(Long, Double)].collect().toMap
    assert(online == Map(2L -> 2.0, 3L -> 3.0, 4L -> 4.0))
    // erasing an absent key is a no-op on serving state
    store.erase(view, Seq(99L).toDF("user_id"), "t2")
    assert(store.online(view).count() == 3L)
    assert(store.history(view).count() == 3L)
  }
}
