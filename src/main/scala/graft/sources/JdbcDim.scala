package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** JDBC dimension source (S2): the deploy-time twin of the static
  * `Schemas.patientsDf` seed.
  *
  * The reference declares `patients` over a named JDBC connection
  * (`flink_statements.tf:23-30, 66-75`; DDL `db.tf:93-97`) and joins the
  * event stream against it. In Spark the same dimension is one
  * `spark.read.jdbc` call — swapping the in-memory seed for the real
  * warehouse is a configuration change, not a code change, because every
  * consumer (`Pipeline`, `Health.enrich`) takes the dim as a DataFrame.
  *
  * Scale notes:
  *  - filters and column selection push into the remote scan (Catalyst
  *    emits `PushedFilters` / a pruned column list on the JDBC relation —
  *    asserted by plan inspection in JdbcDimSpec), so a 10-row or
  *    10-million-row dim ships only what the query needs;
  *  - a small dim like `patients` reads as ONE partition and is
  *    broadcast by `Health.enrich` — no shuffle touches the fact side;
  *    a large dim would add `partitionColumn`/`numPartitions` bounds to
  *    parallelize the read (plumbed through `props` here);
  *  - identifier case is normalized to the engine's lowercase contract
  *    (warehouses like Derby/Oracle uppercase unquoted DDL names).
  */
object JdbcDim {

  def read(spark: SparkSession, url: String, table: String,
      props: java.util.Properties = new java.util.Properties): DataFrame = {
    val raw = spark.read.jdbc(url, table, props)
    raw.select(raw.columns.toIndexedSeq.map(c => col(s"`$c`").as(c.toLowerCase)): _*)
  }

  /** The patients dimension over JDBC, `Schemas.patients`-shaped. */
  def patients(spark: SparkSession, url: String,
      props: java.util.Properties = new java.util.Properties): DataFrame =
    read(spark, url, "patients", props)
}
