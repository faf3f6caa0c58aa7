package graft.functions

/** Rolling split-conformal state: the last observed level plus a ring
  * of the most recent [[RollingConformal.Capacity]] absolute one-step
  * moves in integer micro-units. The ring makes the conformal
  * calibration ADAPTIVE (old moves age out — the Gibbs & Candès
  * adaptation for distribution shift) while keeping state O(Capacity)
  * per key forever — the property that matters on unbounded streams.
  * Order inside the ring is storage order; only the sorted copy is
  * ranked, so eviction position (`idx`) never affects q̂.
  */
final case class ConfBuf(last: Double, ring: Array[Long], idx: Int)

/** The pure recurrence, shared verbatim by the streaming processor and
  * its parity spec (the batch q201 twin uses the same rank formula on
  * a fixed 70/30 split). */
object RollingConformal {
  val Capacity = 64

  def zero: ConfBuf = ConfBuf(Double.NaN, Array.empty, 0)

  /** Finite-sample conformal rank k = ⌈0.9·(m+1)⌉ (q201's formula). */
  def kOf(m: Int): Int = (9 * (m + 1) + 9) / 10

  /** q̂ in micro-units from the current ring; None until the rank
    * exists (m ≥ 9). */
  def qhatMicro(b: ConfBuf): Option[Long] = {
    val m = b.ring.length
    val k = kOf(m)
    if (m == 0 || k > m) None else Some(b.ring.sorted.apply(k - 1))
  }

  /** |move| from the stored level to `avg`, micro-quantized exactly
    * like batch q201; None on the very first observation. */
  def moveMicro(b: ConfBuf, avg: Double): Option[Long] =
    if (b.last.isNaN) None
    else Some(math.abs(math.floor(avg * 1e6 + 0.5).toLong -
      math.floor(b.last * 1e6 + 0.5).toLong))

  /** Fold one observation: record its move (fixed-capacity ring,
    * overwrite-oldest) and advance the level. */
  def push(b: ConfBuf, avg: Double): ConfBuf = moveMicro(b, avg) match {
    case None => ConfBuf(avg, b.ring, b.idx)
    case Some(mv) =>
      if (b.ring.length < Capacity) ConfBuf(avg, b.ring :+ mv, b.idx)
      else {
        val r = b.ring.clone(); r(b.idx) = mv
        ConfBuf(avg, r, (b.idx + 1) % Capacity)
      }
  }
}
