package graft.core

import org.apache.spark.sql.SparkSession

/** Collision-free per-session cache keys (round-12 advice).
  *
  * Session-scoped caches (funnel verdict frames, the LSH edge build, the
  * shared ANN stores) used to key on `System.identityHashCode(spark)` —
  * after a stopped session is garbage-collected a NEW session can land on
  * the same identity hash and be served a dead frame whose checkpoint
  * blocks died with the old session. This maps each live session to a
  * random UUID through a WeakHashMap: the entry (and therefore the key)
  * dies with the session, so a later session can never alias an old one.
  * Cache values for dead sessions are never served again; residual growth
  * is bounded by the number of sessions a process ever creates (test
  * suites: a handful).
  */
object SessionKeys {
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  def of(spark: SparkSession): String =
    ids.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString)
}
