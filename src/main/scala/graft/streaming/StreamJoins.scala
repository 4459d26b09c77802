package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream enrichment join (SURVEY.md J2; the designed-but-unbuilt
  * device-enrichment join of docs/DesignDoc.md:81): INTERVAL-join
  * semantics — each left event pairs with EVERY right row inside the
  * trailing window (one output row per qualifying match; a device that
  * updated three times in the window yields three enriched rows). Reduce
  * to latest-wins downstream when a single enrichment is wanted
  * (max_by/row_number on the right timestamp). Both sides are
  * watermarked, so Spark evicts right-side state once the watermark
  * passes the interval — the "state TTL" the reference design asks for.
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
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $lookbackMs MILLISECONDS") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs"),
      "leftOuter")
  }
}
