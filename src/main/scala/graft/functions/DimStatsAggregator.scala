package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-dimension moment buffer: one count plus four
  * fixed-length (= embedding width) long arrays. Every value is an
  * EXACT integer — components are quantized on entry with the repo's
  * cross-engine floor formula — so merge order can never change a
  * result bit. */
case class DimBuf(var n: Long, s: Array[Long], s2: Array[Long],
                  mn: Array[Long], mx: Array[Long])

/** Per-dimension embedding statistics (count / sum / sum-of-squares /
  * min / max) as ONE typed aggregation over the vector column — the
  * scale-correct alternative to `posexplode` for dense-vector stats.
  *
  * Why this exists when q88 already explodes: an explode plan shuffles
  * n·dims rows to compute 64 groups; at 100 TB of embeddings that is a
  * 64×-amplified shuffle of the biggest table in the lake. Here the
  * shuffle payload per map task is this buffer — 4·dims longs + a
  * count, ~2 KB — regardless of row count, because typed Aggregators
  * get map-side partial aggregation. The per-dimension "groupBy" is
  * array indexing inside the buffer; dims only become rows in the
  * final 64-wide posexplode of the single merged result.
  *
  * Components are quantized to integers (`floor(x·scale + 0.500001)`,
  * the [[graft.Num]] formula) at reduce time, so sums are associative
  * exactly and the DuckDB oracle reproduces every output bit with
  * plain integer SUM/MIN/MAX over an unnest. float→double widening is
  * exact, so both engines quantize identical doubles.
  */
class DimStatsAggregator(dims: Int, scale: Double)
    extends Aggregator[Seq[Float], DimBuf, DimBuf] {

  override def zero: DimBuf = DimBuf(0L,
    new Array[Long](dims), new Array[Long](dims),
    Array.fill(dims)(Long.MaxValue), Array.fill(dims)(Long.MinValue))

  override def reduce(b: DimBuf, v: Seq[Float]): DimBuf = {
    require(v.length == dims, s"expected $dims-dim vector, got ${v.length}")
    var i = 0
    while (i < dims) {
      val q = math.floor(v(i).toDouble * scale + 0.500001).toLong
      b.s(i) += q
      b.s2(i) += q * q
      if (q < b.mn(i)) b.mn(i) = q
      if (q > b.mx(i)) b.mx(i) = q
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(a: DimBuf, b: DimBuf): DimBuf = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    var i = 0
    while (i < dims) {
      a.s(i) += b.s(i)
      a.s2(i) += b.s2(i)
      if (b.mn(i) < a.mn(i)) a.mn(i) = b.mn(i)
      if (b.mx(i) > a.mx(i)) a.mx(i) = b.mx(i)
      i += 1
    }
    a.n += b.n
    a
  }

  override def finish(b: DimBuf): DimBuf = b
  override def bufferEncoder: Encoder[DimBuf] = Encoders.product[DimBuf]
  override def outputEncoder: Encoder[DimBuf] = Encoders.product[DimBuf]
}
