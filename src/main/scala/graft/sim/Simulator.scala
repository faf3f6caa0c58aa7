package graft.sim

import graft.Schemas._
import scala.util.Random

/** Deterministic Scala twin of the reference's data generator
  * (`health-simulator/health_simulator.py`), used to reproduce its
  * implicit acceptance fixture under virtual time (no sleeps, no wall
  * clock):
  *
  *  - one event per patient per tick, default tick 0.2 s
  *    (health_simulator.py:281-296; script.tf:14)
  *  - signal = circadian sine (py:95-102) + clamped Brownian drift
  *    (py:81-92), snapped to the Avro option grids via nearest-option
  *    (py:105-107); grids per schema.tf / FIXTURES.md §A.1
  *  - golden scenario: patient 1 bradycardia injection — onset 30 s,
  *    HR glides linearly to ~20 bpm over 180 s with jitter σ=1.5, SpO2
  *    depressed by up to 6 points (py:110-129)
  */
final class Simulator(seed: Long = 42L, tickSeconds: Double = 0.2,
    patients: Int = 10) {

  private val rng = new Random(seed)

  val hrGrid: Vector[Int] = (55 to 150 by 5).toVector ++ (20 to 50 by 5).toVector
  val spo2Grid: Vector[Int] = (82 to 100 by 2).toVector
  val sysGrid: Vector[Int] = (90 to 180 by 5).toVector
  val diaGrid: Vector[Int] = (60 to 120 by 5).toVector
  val tempGrid: Vector[Float] = (0 to 10).map(i => 35.0f + 0.5f * i).toVector
  val deviceTypes = Vector("wearable_v4", "wearable_v3", "wearable_v2")

  /** Origin of virtual time (epoch ms): the engine-wide 2024-01-01
    * origin ([[graft.ops.Health.OriginMs]]). */
  val originMs: Long = graft.ops.Health.OriginMs

  // bradycardia injection parameters (health_simulator.py:110-129)
  val bradyPatient = 1
  val bradyOnsetS = 30.0
  val bradyDurationS = 180.0
  val bradyTargetHr = 20.0
  val bradyJitterSigma = 1.5
  val bradySpo2Drop = 6.0

  private def nearest(grid: Vector[Int], x: Double): Int =
    grid.minBy(g => math.abs(g - x))

  private val drift = Array.fill(patients + 1)(0.0)

  /** Continuous heart-rate signal for a patient at elapsed seconds t
    * (pre-snap): baseline + circadian sine + clamped Brownian drift,
    * with the patient-1 glide overriding during the injection window. */
  private[sim] def heartRateSignal(patient: Int, tSeconds: Double): Double = {
    if (patient == bradyPatient && tSeconds >= bradyOnsetS) {
      val progress = math.min(1.0, (tSeconds - bradyOnsetS) / bradyDurationS)
      val base = 65.0 + (bradyTargetHr - 65.0) * progress
      base + rng.nextGaussian() * bradyJitterSigma
    } else {
      val baseline = 70.0 + 3.0 * (patient % 5)
      val circadian = 8.0 * math.sin(2 * math.Pi * tSeconds / 86400.0)
      drift(patient) = math.max(-10.0,
        math.min(10.0, drift(patient) + rng.nextGaussian() * 0.8))
      baseline + circadian + drift(patient)
    }
  }

  private def eventId(): String =
    Iterator.continually(rng.nextPrintableChar())
      .filter(c => c.isLetterOrDigit && !c.isUpper).take(12).mkString

  def makeEvent(patient: Int, tSeconds: Double): HealthEvent = {
    val hr = heartRateSignal(patient, tSeconds)
    val inBrady = patient == bradyPatient && tSeconds >= bradyOnsetS
    val spo2Base = 97.0 - (if (inBrady)
      bradySpo2Drop * math.min(1.0, (tSeconds - bradyOnsetS) / bradyDurationS)
    else 0.0)
    HealthEvent(
      eventId(),
      patient,
      DeviceMetadata(
        deviceTypes(rng.nextInt(deviceTypes.size)),
        5 + 5 * rng.nextInt(20),
        { val r = rng.nextDouble(); if (r < 0.8) "stable" else if (r < 0.95) "noisy" else "offline" }),
      Vitals(
        nearest(hrGrid, hr),
        nearest(spo2Grid, spo2Base + rng.nextGaussian()),
        BloodPressure(
          nearest(sysGrid, 120 + rng.nextGaussian() * 8),
          nearest(diaGrid, 80 + rng.nextGaussian() * 6)),
        tempGrid(math.min(tempGrid.size - 1,
          math.max(0, (2 + rng.nextGaussian()).round.toInt)))),
      new java.sql.Timestamp(originMs + (tSeconds * 1000).round))
  }

  /** All events for `durationSeconds` of virtual time, one per patient
    * per tick, in tick order (round-robin across patients within a tick,
    * like the python loop at health_simulator.py:281-296). */
  def run(durationSeconds: Double): Seq[HealthEvent] = {
    val ticks = (durationSeconds / tickSeconds).toInt
    for {
      k <- 0 until ticks
      p <- 1 to patients
    } yield makeEvent(p, k * tickSeconds)
  }
}
