package graft

/** Silences the per-task `WindowExec: No Partition Defined` warning.
  *
  * The registry keeps a hand-audited allowlist of domain-bounded global
  * windows (PlanAuditSpec) — each one is a deliberate ≤O(thousands)-row
  * sort, but WindowExec warns once PER TASK, and in round 7 those
  * thousands of identical lines displaced the benchmark's JSON lines out
  * of the driver's bounded stdout tail (`BENCH_r07.json` tail = pure WARN
  * spam). The plans are already gated; the warning adds nothing here.
  */
object Quiet {
  def install(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // log4j-core absent: keep running
}
