package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing args = subset of query names (dev loop, like
    // Bench); the driver passes exactly two args and gets everything
    val selected =
      if (args.length <= 2) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.drop(2).toSet).toMap
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // cluster-shape overrides for the config-invariance sweep: a 100 TB
    // deployment runs AQE with shuffle.partitions=200 (the Spark
    // default), not the local thread count — results must be identical
    // under both shapes (BASELINE.md records the 427/427 sweep)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (aqe.nonEmpty) b.config("spark.sql.adaptive.enabled", aqe)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.install() // keep WindowExec's per-task warning out of the tail
    new java.io.File(outDir).mkdirs()
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // stdout AND an artifact: round 5's stderr-only logging let 18
        // crashed queries vanish from the correctness record entirely
        val msg = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}"
        println(s"[verify] FAILED $name: $msg")
        failures(name) = msg
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val failJson = failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_failures.json"), failJson)
    spark.stop()
  }
}
