package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition probe (dev loop only). */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    Quiet.install()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Quiet.install()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      val ls = t("scan+count lineitem") {
        val df = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        df.write.format("noop").mode("overwrite").save(); df
      }
      val sets = t("order sets agg (noop)") {
        val df = ls.groupBy(col("ok")).agg(sort_array(collect_set(col("sk"))).as("sks"))
        df.write.format("noop").mode("overwrite").save(); df
      }
      val bb = t("full backbone (ckpt)") {
        sets
          .select(explode(expr("""flatten(transform(sks, (x, i) ->
            transform(slice(sks, i + 2, size(sks)), y ->
              struct(x AS u, y AS v))))""")).as("p"))
          .select(col("p.u").as("u"), col("p.v").as("v"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n_orders"))
          .filter(col("n_orders") >= 3)
          .orderBy(col("n_orders").desc, col("u"), col("v")).limit(5000)
          .select(col("u"), col("v"))
          .localCheckpoint()
      }
      t("triangle joins (noop)") {
        val e = bb
        val w = e.as("e1").join(e.as("e2"), col("e1.v") === col("e2.u"))
          .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
        w.join(e.as("e3"), col("a") === col("e3.u") && col("c") === col("e3.v"))
          .groupBy(col("a")).agg(count(lit(1)).as("n"))
          .write.format("noop").mode("overwrite").save()
      }
      t("empty job (parallelize)") {
        spark.sparkContext.parallelize(1 to 32, 32).count()
      }
      t("tiny shuffle job") {
        spark.range(1000).groupBy((col("id") % 7).as("k")).count()
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
