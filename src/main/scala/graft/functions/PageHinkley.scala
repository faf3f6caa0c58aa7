package graft.functions

/** Page–Hinkley drift state: running count/sum plus BOTH one-sided
  * cumulative statistics and their running minima. O(1), sequential
  * (the PH statistic is defined over the arrival order — like ETS it
  * has no associative merge; the streaming processor owns the fold and
  * specs replay the identical recurrence). */
final case class PhBuf(n: Long, sum: Double, mInc: Double, minInc: Double,
    mDec: Double, minDec: Double)

/** The Page–Hinkley test (Page 1954; the standard streaming mean-shift
  * detector): m_T = Σ (x_t − x̄_t ∓ δ) drifts downward under the null
  * and climbs after a shift; alarm when it exceeds its running minimum
  * by λ. Two-sided here: `inc` detects upward shifts, `dec` downward.
  * All doubles, deterministic sequential fold — bit-reproducible. */
object PageHinkley {
  val zero: PhBuf = PhBuf(0L, 0.0, 0.0, 0.0, 0.0, 0.0)

  /** One observation, in arrival order. The running mean INCLUDES x_t
    * (the usual formulation — self-normalizing from the first point). */
  def step(b: PhBuf, x: Double, delta: Double): PhBuf = {
    val n = b.n + 1
    val sum = b.sum + x
    val mean = sum / n
    val mInc = b.mInc + (x - mean - delta)
    val mDec = b.mDec + (mean - x - delta)
    PhBuf(n, sum, mInc, math.min(b.minInc, mInc),
      mDec, math.min(b.minDec, mDec))
  }

  /** Upward-shift statistic: alarm when > λ. */
  def incStat(b: PhBuf): Double = b.mInc - b.minInc

  /** Downward-shift statistic: alarm when > λ. */
  def decStat(b: PhBuf): Double = b.mDec - b.minDec
}
