package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded second-moment buffer for dense vectors: count, per-dim sums,
  * and the upper triangle (diagonal included) of the cross-product
  * matrix, flattened row-major — dims·(dims+1)/2 longs. All EXACT
  * integers (components quantized on entry), so merges are associative
  * bit-for-bit. */
case class CovBuf(var n: Long, s: Array[Long], ss: Array[Long])

/** Vector cross-moment aggregation for covariance/PCA: one typed
  * Aggregator pass produces everything a covariance matrix needs
  * (n, Σq_i, Σq_i·q_j), in a buffer whose size depends on the vector
  * width alone — ~17 KB at 64 dims — never on the row count. The
  * explode alternative shuffles n·dims·(dims+1)/2 rows; this ships one
  * buffer per map task (map-side partial aggregation), the same
  * scale argument as [[DimStatsAggregator]] but for second moments.
  *
  * Components are quantized with the repo's floor formula at reduce
  * time; q·q ≤ 1e8 and Σ stays far inside int64 through the 30×
  * replicas (exact bound: rows · 1e8 < 2^63 ⇒ safe below ~9e10 rows
  * per aggregation group). */
class CovAggregator(dims: Int, scale: Double)
    extends Aggregator[Seq[Float], CovBuf, CovBuf] {

  private val tri = dims * (dims + 1) / 2

  override def zero: CovBuf = CovBuf(0L, new Array[Long](dims), new Array[Long](tri))

  override def reduce(b: CovBuf, v: Seq[Float]): CovBuf = {
    require(v.length == dims, s"expected $dims-dim vector, got ${v.length}")
    val q = new Array[Long](dims)
    var i = 0
    while (i < dims) {
      q(i) = math.floor(v(i).toDouble * scale + 0.500001).toLong
      b.s(i) += q(i)
      i += 1
    }
    var k = 0
    i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        b.ss(k) += q(i) * q(j)
        k += 1
        j += 1
      }
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(a: CovBuf, b: CovBuf): CovBuf = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    var i = 0
    while (i < dims) { a.s(i) += b.s(i); i += 1 }
    var k = 0
    while (k < tri) { a.ss(k) += b.ss(k); k += 1 }
    a.n += b.n
    a
  }

  override def finish(b: CovBuf): CovBuf = b
  override def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
  override def outputEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
}
