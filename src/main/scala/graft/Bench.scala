package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same timezone as Verify: after the NTZ→Timestamp cast in
      // Tables.events, a non-UTC wall clock would bench different plans
      // than the ones Verify checks
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // run the FULL plan (sorts, projections and all) into the no-op
    // sink — a count() would let the optimizer strip the final orderBy
    // and prune columns, timing a cheaper plan than Verify executes
    // failures must be LOUD: name + exception per query, and a "failed"
    // list in the artifact — round 5 shipped 18 crashed queries as silent
    // -1.0 sentinels that made the total LOOK smaller than round 4's
    def run(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        println(s"[bench] FAILED $name: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}")
        false
      }
    // optional args = subset of query names (dev loop); driver passes none
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    // warmup pass: JIT + codegen + parquet footer caches, untimed — the
    // timed pass then measures the engine, not JVM startup
    selected.foreach { case (name, fn) => run(name, fn) }
    // two timed passes, report per-query MIN: serial suite timing on a
    // busy local[32] JVM swings individual queries 2-6x (GC, JIT churn
    // from neighboring plans); min-of-2 makes round-over-round deltas
    // signal instead of noise
    def timeOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      if (run(name, fn)) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    val pass1 = selected.map { case (name, fn) => name -> timeOnce(name, fn) }
    val pass2 = selected.map { case (name, fn) => name -> timeOnce(name, fn) }
    val results = selected.keys.map { name =>
      val (a, b) = (pass1(name), pass2(name))
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }.toMap
    def s3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + s3(v) }
      .mkString("{", ",", "}")
    // total sums RUNNING queries only — a -1.0 sentinel must never make
    // the suite look faster; failed queries are named separately
    val failed = results.collect { case (k, v) if v < 0 => k }.toSeq.sorted
    val total = results.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    spark.stop()
    // streaming throughput under a PINNED protocol (full driver runs
    // only): two FRESH forked JVMs each driving graft.StreamBench at
    // 100 patients x 600 sim-seconds, report the better — fresh JVMs
    // remove the warm-state wobble that made r3/r4 numbers (8300 vs
    // 6938 ev/s) incomparable. -1 = fork failed, never throws.
    val eps = if (args.isEmpty) streamEps() else -1L
    val detailed =
      s"""{"metric":"total","value":${s3(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","stream_eps":$eps}"""
    // full per-query map to a FILE: the driver's stdout tail keeps only
    // ~70 of 156 queries of the detailed line, so round-over-round
    // regression diffs read this artifact instead
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_QUERIES.json"),
      (detailed + "\n").getBytes("UTF-8"))
    // detailed per-query line first (for humans / full logs) ...
    println(detailed)
    // ... then a SHORT final line: the driver keeps only a bounded tail
    // of stdout, which starts mid-way through the ~2.6KB detailed line —
    // the LAST line must be self-contained and <150 bytes so json.loads
    // always sees one complete object at the end of the tail
    println(s"""{"metric":"total","value":${s3(total)},"unit":"sec","n":${results.size},"nfail":${failed.size},"sf":"$sfDir","stream_eps":$eps,"qfile":"BENCH_QUERIES.json"}""")
  }

  /** Fork `graft.StreamBench 100 600` in a fresh JVM (inheriting this
    * JVM's module flags and classpath), twice; return the better run's
    * events/s. Fresh-JVM + max-of-2 is the pinned streaming protocol. */
  private def streamEps(): Long = {
    try {
      import scala.jdk.CollectionConverters._
      val javaBin = new java.io.File(
        new java.io.File(System.getProperty("java.home"), "bin"),
        "java").getAbsolutePath
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments.asScala.toSeq
      val cmd = (Seq(javaBin) ++ jvmArgs ++ Seq(
        "-cp", System.getProperty("java.class.path"),
        "graft.StreamBench", "100", "600")).asJava
      def once(): Double = {
        val pb = new ProcessBuilder(cmd)
        pb.redirectErrorStream(true)
        val p = pb.start()
        val lines = scala.io.Source.fromInputStream(p.getInputStream)
          .getLines().toVector
        p.waitFor()
        lines.reverseIterator
          .find(_.contains("\"stream_events_per_sec\""))
          .flatMap(l => """"value":([0-9.eE+]+)""".r.findFirstMatchIn(l))
          .map(_.group(1).toDouble).getOrElse(-1.0)
      }
      math.max(once(), once()).round
    } catch { case _: Throwable => -1L }
  }
}
