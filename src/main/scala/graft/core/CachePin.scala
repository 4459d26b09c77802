package graft.core

import org.apache.spark.sql.DataFrame

/** Release discipline for multi-pass cache pins.
  *
  * Operators that scan an input several times (cut-point probe, per-bucket
  * totals, final pass) pin it with `persist()`. `Dataset.persist` registers
  * the plan in the session CacheManager, which holds it by STRONG reference
  * — without an explicit release, every invocation (bench warm-up + timed
  * run, repeated verify calls) leaks its pin into executor storage for the
  * session lifetime.
  *
  * The fix pattern: eagerly materialize the (bounded) result with a local
  * checkpoint, then unpersist the pins. The checkpoint's own blocks are
  * ContextCleaner-managed — held by weak reference and released as soon as
  * the returned frame is garbage-collected — so nothing accumulates across
  * invocations.
  */
object CachePin {

  /** Materializes `result` eagerly (cutting its lineage to the pinned
    * inputs), then unpersists every pin. Call only when `result` is the
    * final multi-pass output and is bounded (an aggregate, a top-k, a
    * post-groupBy table) — the checkpoint stores one copy of it. */
  def sealAndRelease(result: DataFrame, pinned: DataFrame*): DataFrame =
    // finally: a failed materialization must still drop the pins, or the
    // failure path leaks exactly the cache entries this exists to release
    try result.localCheckpoint(eager = true)
    finally pinned.foreach(_.unpersist(blocking = false))
}
