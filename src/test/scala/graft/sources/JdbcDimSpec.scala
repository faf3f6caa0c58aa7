package graft.sources

import graft.{Schemas, SparkSpec}
import graft.ops.Health
import org.apache.spark.sql.functions._

/** S2 integration proof: the patients dimension read through a REAL
  * `spark.read.jdbc` scan (embedded Derby, the JDBC engine shipped in
  * Spark's own jars) is byte-equivalent to the static seed, the dim
  * swap into the enrichment join is invisible to the pipeline, and
  * filters/column pruning reach the remote scan.
  */
class JdbcDimSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdim;create=true"

  private lazy val seeded: Unit = {
    // Derby's embedded driver auto-registers on first connection in
    // recent JVMs via the service loader; load explicitly to be safe
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // db.tf:93-97 DDL shape (SERIAL id -> INT here; same data domain)
      st.executeUpdate(
        "CREATE TABLE patients (patient_id INT PRIMARY KEY, name VARCHAR(100), age INT)")
      val ins = conn.prepareStatement("INSERT INTO patients VALUES (?, ?, ?)")
      Schemas.patients.foreach { p =>
        ins.setInt(1, p.patient_id); ins.setString(2, p.name); ins.setInt(3, p.age)
        ins.executeUpdate()
      }
    } finally conn.close()
  }

  test("spark.read.jdbc returns exactly the static seed dim") {
    seeded
    val viaJdbc = JdbcDim.patients(spark, url)
      .orderBy(col("patient_id")).collect().toSeq
    val static = Schemas.patientsDf(spark)
      .orderBy(col("patient_id")).collect().toSeq
    assert(viaJdbc.map(_.toSeq) == static.map(_.toSeq))
  }

  test("dim swap: enrichment join over the JDBC dim matches the static path") {
    seeded
    import spark.implicits._
    val events = Seq((1, "e1", 72), (4, "e2", 98), (10, "e3", 61), (11, "e4", 55))
      .toDF("patient_id", "event_id", "heart_rate")
    val viaJdbc = Health.enrich(events, JdbcDim.patients(spark, url),
      "patient_id", "patient_id")
      .orderBy(col("event_id")).collect().toSeq
    val static = Health.enrich(events, Schemas.patientsDf(spark),
      "patient_id", "patient_id")
      .orderBy(col("event_id")).collect().toSeq
    assert(viaJdbc.map(_.toSeq) == static.map(_.toSeq))
    assert(viaJdbc.size == 3) // patient 11 has no dim row (inner join)
  }

  test("filter pushdown and column pruning reach the JDBC scan") {
    seeded
    val df = spark.read.jdbc(url, "patients", new java.util.Properties)
      .filter(col("AGE") > 50).select(col("NAME"))
    val plan = df.queryExecution.executedPlan.toString
    // the scan node itself advertises the pushed predicate...
    assert(plan.contains("PushedFilters"), s"no PushedFilters in:\n$plan")
    assert(plan.replaceAll("\\s", "").contains("AGE"), s"AGE filter not pushed:\n$plan")
    // ...and reads only the projected+filtered columns, not the table
    val scanOutput = df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.output.map(_.name)).toSet
    assert(!scanOutput.contains("PATIENT_ID"),
      s"column pruning failed, scan reads: $scanOutput")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("Daniel Wilson", "Emily Davis", "Laura Garcia", "Robert Miller"))
  }
}
