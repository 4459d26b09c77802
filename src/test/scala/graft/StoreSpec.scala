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

  test("TTL expires stale online rows") {
    val store = newStore()
    store.upsert(view, rows((1L, 100L, 1.0), (2L, 5000L, 2.0)), 0L)
    store.applyTtl(view, nowMs = 5500L) // ttl 1000 -> keep fts >= 4500
    val left = store.getOnlineFeatures(view, Seq(1L, 2L).toDF("user_id"))
      .filter($"v".isNotNull).select($"user_id").as[Long].collect().toSet
    assert(left == Set(2L))
  }

  test("PIT validator flags inconsistency and passes consistent stores") {
    val store = newStore()
    store.upsert(view, rows((1L, 100L, 1.0), (1L, 200L, 2.0)), 0L)
    val ok = HistoricalStore.validateConsistency(
      spark.read.parquet(s"${storeRoot(store)}/online/${view.name}"),
      store.history(view), view, "v")
    assert(ok.count() == 0L)
    // corrupt the online value -> violation surfaces
    val bad = store.history(view).filter($"feature_timestamp" === 200L)
      .withColumn("v", lit(99.0))
    val viol = HistoricalStore.validateConsistency(
      bad, store.history(view), view, "v")
    assert(viol.count() == 1L)
  }

  private def storeRoot(s: OnlineStore): String = {
    val f = s.getClass.getDeclaredField("root")
    f.setAccessible(true)
    f.get(s).asInstanceOf[String]
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
}
