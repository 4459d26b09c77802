package graft.core

/** The engine's canonical window horizons (models/config.py:27-28, 72-74
  * in the reference): single definition shared by the batch RANGE-frame
  * builders, the stateful streaming ops, and their oracle SQL — tuning a
  * horizon in one place cannot desynchronize paths that are checked
  * against the same oracle. */
object Horizons {
  val H5M = 300000L
  val H30M = 1800000L
  val H24H = 86400000L
  val SessionGapMs = 1800000L // 30 min inactivity gap (base_generator.py:275)
}
