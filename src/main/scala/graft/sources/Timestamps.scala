package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Timestamp extraction (SURVEY.md W9, ref streaming/core/utils/
  * watermarks.py:29-64): accept ISO-8601 strings, unix seconds, or unix
  * millis, falling back to the processing time — as one coalescing
  * codegen-friendly expression, no UDF. */
object Timestamps {

  /** Heuristic epoch-number handling: values >= 1e12 are millis,
    * else seconds (watermarks.py uses the same magnitude test).
    * ANSI-safe: numeric casts are gated on a digits regex and string
    * parsing uses try_to_timestamp, so malformed input falls through
    * instead of raising. */
  def extract(c: Column): Column = {
    val s = c.cast("string")
    // <=14 integer digits: beyond that the long/timestamp casts would
    // overflow under ANSI instead of falling through
    val isNum = s.rlike("^\\d{1,14}(\\.\\d+)?$")
    val asNum = when(isNum, s).cast("double")
    coalesce(
      // numeric epoch (seconds or millis)
      when(isNum,
        when(asNum >= 1e12, timestamp_millis(asNum.cast("long")))
          .otherwise(timestamp_seconds(asNum))),
      // ISO-8601 / date-time strings
      try_to_timestamp(s),
      // fallback: processing time
      current_timestamp())
  }
}
