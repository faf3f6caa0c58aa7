package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: prints PlanAudit.violations and the relevant plan slice for
  * the named queries — used to tune the boundedness prover. */
object DebugAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = Registry.queries(name)(spark, sfDir)
      println(s"==== $name violations: ${PlanAudit.violations(df)}")
      if (args.length == 1) println(df.queryExecution.executedPlan.toString())
    }
    spark.stop()
  }
}
