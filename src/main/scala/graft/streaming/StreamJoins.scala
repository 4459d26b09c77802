package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream enrichment join (SURVEY.md J2; the designed-but-unbuilt
  * device-enrichment join of docs/DesignDoc.md:81): left events enriched
  * with the latest-known right-side row within a trailing time window,
  * both sides watermarked so the join state is bounded — Spark evicts
  * right-side rows once the watermark passes the interval, which is the
  * "state TTL" the reference design asks for.
  */
object StreamJoins {

  /** @param left       watermarked stream with `leftTs` (timestamp) + key
    * @param right      watermarked stream with `rightTs` (timestamp) + key
    * @param key        equi-join key name on both sides
    * @param lookbackMs right rows qualify within [leftTs - lookback, leftTs]
    */
  def enrichLeft(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String, lookbackMs: Long): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL ${lookbackMs / 1000} SECONDS") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs"),
      "leftOuter")
  }
}
