package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** O(1) bivariate regression state: co-moment form (never raw Σx²,
  * which cancels catastrophically for epoch-scale x), parallel-mergeable. */
final case class RegState(
    n: Long, meanX: Double, meanY: Double,
    mXX: Double, mXY: Double, mYY: Double,
    minX: Double, maxX: Double) {

  def add(x: Double, y: Double): RegState = {
    val n1 = n + 1
    val dx = x - meanX
    val dy = y - meanY
    val meanX1 = meanX + dx / n1
    val meanY1 = meanY + dy / n1
    RegState(n1, meanX1, meanY1,
      mXX + dx * (x - meanX1),
      mXY + dx * (y - meanY1),
      mYY + dy * (y - meanY1),
      if (n == 0) x else math.min(minX, x),
      if (n == 0) x else math.max(maxX, x))
  }

  def combine(o: RegState): RegState = {
    if (n == 0) o
    else if (o.n == 0) this
    else {
      val nT = n + o.n
      val dx = o.meanX - meanX
      val dy = o.meanY - meanY
      RegState(nT,
        meanX + dx * o.n / nT,
        meanY + dy * o.n / nT,
        mXX + o.mXX + dx * dx * n * o.n / nT,
        mXY + o.mXY + dx * dy * n * o.n / nT,
        mYY + o.mYY + dy * dy * n * o.n / nT,
        math.min(minX, o.minX), math.max(maxX, o.maxX))
    }
  }
}

/** One forecast step — exactly the reference's 6-field UNNEST row
  * (flink_statements.tf:325-332). AIC is None for a perfect fit
  * (mse = 0), matching the SQL baseline's `CASE WHEN mse > 0` NULL. */
final case class ForecastRow(
    forecast_timestamp: Double,
    forecast_value: Double,
    lower_bound: Double,
    upper_bound: Double,
    rmse: Double,
    aic: Option[Double])

/** M2 — `ML_FORECAST(value, ts, config)` parity baseline (reference:
  * flink_statements.tf:305-316; pinned semantics SURVEY.md §7.3): OLS
  * trend over the key's history, extrapolated `horizon` steps of one
  * mean inter-arrival each, with `confidencePercentage` Gaussian
  * prediction bounds, in-sample RMSE, and AIC (Gaussian, k=2).
  *
  * Input is (t, value) where t is any monotone time coordinate (the
  * engine uses fractional days — [[graft.ops.Health.tsDays]]).
  */
class ForecastAggregator(minTrainingSize: Int, horizon: Int,
    confidencePercentage: Double)
    extends Aggregator[(Double, Double), RegState, Array[ForecastRow]] {

  private val z = Stats.normalQuantile(0.5 + confidencePercentage / 200.0)

  override def zero: RegState = RegState(0, 0, 0, 0, 0, 0, 0, 0)
  override def reduce(b: RegState, tv: (Double, Double)): RegState =
    b.add(tv._1, tv._2)
  override def merge(a: RegState, b: RegState): RegState = a.combine(b)

  override def finish(b: RegState): Array[ForecastRow] = {
    val minN = math.max(minTrainingSize, 3)
    if (b.n < minN || b.mXX <= 0.0) return Array.empty
    val slope = b.mXY / b.mXX
    val sse = math.max(0.0, b.mYY - b.mXY * b.mXY / b.mXX)
    val mse = sse / b.n
    val rmse = math.sqrt(mse)
    val aic = if (mse > 0) Some(b.n * math.log(mse) + 4.0) else None
    val step = (b.maxX - b.minX) / (b.n - 1)
    Array.tabulate(horizon) { h =>
      val xh = b.maxX + (h + 1) * step
      val v = b.meanY + slope * (xh - b.meanX)
      ForecastRow(xh, v, v - z * rmse, v + z * rmse, rmse, aic)
    }
  }

  override def bufferEncoder: Encoder[RegState] = Encoders.product[RegState]
  override def outputEncoder: Encoder[Array[ForecastRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ForecastRow]]()
}
