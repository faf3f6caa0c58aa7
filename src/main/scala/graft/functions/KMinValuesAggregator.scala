package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded buffer for the k smallest DISTINCT hash values seen so far:
  * `hs` is sorted ascending, duplicate-free, and never longer than k.
  */
case class KMinBuf(hs: Array[Long])

/** KMV (k-minimum-values) sketch core: the k-th smallest distinct
  * 60-bit hash h_k of a key stream, from which distinct-count is
  * estimated as (k-1)·2^60/h_k (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM 2002).
  *
  * Scale shape — this is the piece that makes KMV viable at 100 TB:
  * partial aggregation (map-side combine) caps every pre-shuffle
  * buffer at k longs, so the shuffle moves ≤ k·partitions values per
  * group instead of every distinct hash. The previous plan
  * (`distinct()` + `row_number()` over a 3-value partition key) sorted
  * ALL distinct hashes of a group in one task — correct at sf0.1,
  * single-task-sort death at 100×. Here no full sort exists anywhere:
  * per-row cost is a binary search in a 256-entry array (O(1) skip
  * once saturated and the value exceeds the current k-th min).
  *
  * Returns -1 when fewer than k distinct values exist (caller filters),
  * mirroring the oracle's `WHERE rn = k` producing no row.
  */
class KMinValuesAggregator(k: Int) extends Aggregator[Long, KMinBuf, Long] {

  override def zero: KMinBuf = KMinBuf(Array.emptyLongArray)

  override def reduce(b: KMinBuf, v: Long): KMinBuf = {
    val hs = b.hs
    val n = hs.length
    // saturated and not smaller than the current k-th min: O(1) reject —
    // the overwhelmingly common path once the buffer warms up
    if (n == k && v >= hs(n - 1)) return b
    val i = java.util.Arrays.binarySearch(hs, v)
    if (i >= 0) return b // duplicate hash: KMV counts distinct values
    val ins = -i - 1
    val outLen = if (n == k) k else n + 1
    val out = new Array[Long](outLen)
    System.arraycopy(hs, 0, out, 0, ins)
    out(ins) = v
    System.arraycopy(hs, ins, out, ins + 1, outLen - ins - 1)
    KMinBuf(out)
  }

  override def merge(a: KMinBuf, b: KMinBuf): KMinBuf = {
    if (a.hs.isEmpty) return b
    if (b.hs.isEmpty) return a
    // merge two sorted duplicate-free arrays, keep the k smallest
    val out = new Array[Long](math.min(k, a.hs.length + b.hs.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.hs.length || j < b.hs.length)) {
      out(o) =
        if (j >= b.hs.length) { i += 1; a.hs(i - 1) }
        else if (i >= a.hs.length) { j += 1; b.hs(j - 1) }
        else if (a.hs(i) < b.hs(j)) { i += 1; a.hs(i - 1) }
        else if (a.hs(i) > b.hs(j)) { j += 1; b.hs(j - 1) }
        else { i += 1; j += 1; a.hs(i - 1) } // equal: consume both once
      o += 1
    }
    KMinBuf(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
  }

  override def finish(b: KMinBuf): Long =
    if (b.hs.length == k) b.hs(k - 1) else -1L

  override def bufferEncoder: Encoder[KMinBuf] = Encoders.product[KMinBuf]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
