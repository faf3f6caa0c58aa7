package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** One keyed observation for the streaming SRM monitor. */
final case class SrmEvent(event_type: String, user_id: Long)

/** A running sample-ratio-mismatch snapshot for one event-type segment
  * after folding a micro-batch: distinct-user arm counts, the df=1
  * chi-square (nₐ−n_b)²/(nₐ+n_b) and the 3.841 flag — the SAME
  * statistic batch q235 reports per segment. */
final case class SrmSnapshot(event_type: String, n_a: Long, n_b: Long,
    chi2: Double, srm_flag: Boolean)

/** Streaming twin of q235's per-segment SRM gate: a continuously
  * maintained chi-square on DISTINCT-user counts per md5 arm, emitted
  * after every micro-batch so an experiment platform can halt a
  * broken rollout mid-flight instead of at readout. Keyed by
  * event_type; per-key state is the seen-user set (a MapState keyed
  * by user_id) plus the two arm counters — the same (type × user)
  * frame the batch query's distinct pass builds, maintained
  * incrementally at O(batch) per micro-batch. The arm hash reproduces
  * `Dedup.h60("ab|" || user) % 2` bit-for-bit (md5 hex, first 15
  * nibbles, base-16, mod 2), so streaming counts are the batch
  * counts by construction — pinned by StreamingSrmSpec against the
  * q235 oracle frame. (q235's __all__ segment is a cross-key fold and
  * lives downstream of these per-segment snapshots.)
  */
class SrmProcessor
    extends StatefulProcessor[String, SrmEvent, SrmSnapshot] {

  @transient private var seen: MapState[Long, Boolean] = _
  @transient private var arms: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    seen = getHandle.getMapState("seen", Encoders.scalaLong,
      Encoders.scalaBoolean, TTLConfig.NONE)
    arms = getHandle.getValueState("arms",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[SrmEvent],
      timerValues: TimerValues): Iterator[SrmSnapshot] = {
    var (na, nb) = if (arms.exists()) arms.get() else (0L, 0L)
    rows.foreach { e =>
      if (!seen.containsKey(e.user_id)) {
        seen.updateValue(e.user_id, true)
        if (SrmProcessor.arm(e.user_id) == 0L) na += 1 else nb += 1
      }
    }
    arms.update((na, nb))
    val tot = na + nb
    val chi2 =
      if (tot == 0) 0.0
      else { val dn = (na - nb).toDouble; dn * dn / tot }
    Iterator.single(SrmSnapshot(key, na, nb, chi2, chi2 > 3.841))
  }
}

object StreamingSrm {
  /** Wires [[SrmProcessor]] over a stream with `event_type` and
    * `user_id` columns. */
  def monitor(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Dataset[SrmSnapshot] = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col("event_type"), col("user_id").cast("long"))
      .as[SrmEvent]
      .groupByKey(_.event_type)
      .transformWithState(new SrmProcessor(),
        TimeMode.None(), OutputMode.Update())
  }
}

object SrmProcessor {
  /** JVM twin of `Dedup.h60(concat("ab|", user)) % 2`: md5 hex, first
    * 15 nibbles, base 16 — bit-identical to the SQL/Column primitive. */
  def arm(userId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ab|$userId".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2
  }
}
