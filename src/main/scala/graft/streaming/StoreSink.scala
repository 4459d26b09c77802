package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.store.{FeatureView, OnlineStore}

/** Streaming -> feature-store integration: the foreachBatch sink that
  * upserts each micro-batch of feature rows into the online store
  * (SURVEY.md S7/W10). Exactly-once: OnlineStore.upsert is idempotent per
  * batchId, so a replayed micro-batch after failure/restart is a no-op —
  * the same contract Delta's txnAppId/txnVersion provides at scale.
  */
object StoreSink {

  def writeTo(features: DataFrame, store: OnlineStore, view: FeatureView,
              checkpointDir: String): StreamingQuery =
    features.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.upsert(view, batch, batchId)
      }
      .start()
}
