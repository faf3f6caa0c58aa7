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
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.3f s")
      r
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep ---")
      // r8/r9 backbone: distinct + self-join, each stage its own shuffle
      t("backbone r9 (ckpt)") {
        val ls = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
          .distinct()
        ls.as("a").join(ls.as("b"),
            col("a.ok") === col("b.ok") && col("a.sk") < col("b.sk"))
          .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
          .agg(count(lit(1)).as("n_orders"))
          .filter(col("n_orders") >= 3)
          .orderBy(col("n_orders").desc, col("u"), col("v")).limit(5000)
          .select(col("u"), col("v"))
          .localCheckpoint()
      }
      // candidate: repartition by ok first -> distinct and the self-join
      // both reuse the one exchange; shuffle_hash avoids the SMJ sorts
      t("backbone co-part (ckpt)") {
        val ls = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
          .repartition(col("ok"))
          .distinct()
          .localCheckpoint()
        ls.as("a").join(ls.as("b").hint("shuffle_hash"),
            col("a.ok") === col("b.ok") && col("a.sk") < col("b.sk"))
          .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
          .agg(count(lit(1)).as("n_orders"))
          .filter(col("n_orders") >= 3)
          .orderBy(col("n_orders").desc, col("u"), col("v")).limit(5000)
          .select(col("u"), col("v"))
          .localCheckpoint()
      }
      // candidate without the intermediate checkpoint
      t("backbone co-part nockpt (ckpt)") {
        val ls = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
          .repartition(col("ok"))
          .distinct()
        ls.as("a").join(ls.as("b").hint("shuffle_hash"),
            col("a.ok") === col("b.ok") && col("a.sk") < col("b.sk"))
          .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
          .agg(count(lit(1)).as("n_orders"))
          .filter(col("n_orders") >= 3)
          .orderBy(col("n_orders").desc, col("u"), col("v")).limit(5000)
          .select(col("u"), col("v"))
          .localCheckpoint()
      }
      t("empty job (parallelize)") {
        spark.sparkContext.parallelize(1 to 32, 32).count()
      }
    }
    spark.stop()
  }
}
