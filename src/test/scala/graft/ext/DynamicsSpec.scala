package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 38: q324 tail dependence, q325
  * recurrence quantification, q326 sample entropy.
  */
class DynamicsSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dy").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private val day = 86400000L

  private def series(xs: Seq[Int], value: Int => Double = _ => 1.0) = {
    var id = 0L
    xs.zipWithIndex.flatMap { case (c, dd) =>
      (1 to c).map { _ =>
        id += 1
        (id, new java.sql.Timestamp(base + dd * day + id * 1000L), 1L, "view",
          value(dd), "{}")
      }
    }
  }

  test("q324: comonotone days give lambda 1; antimonotone upper tail gives 0") {
    import spark.implicits._
    val co = series((1 to 10).toSeq, dd => (dd + 1).toDouble)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q324_tail_dependence").run(spark, plantDir("events" -> co)).head()
    assert(r.getAs[Long]("n_days") == 10L)
    assert(math.abs(r.getAs[Double]("lambda_upper") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("lambda_lower") - 1.0) < 1e-9)
    // per-event value (10-dd)/(dd+1) makes the DAILY total decrease in dd
    val anti = series((1 to 10).toSeq, dd => (10.0 - dd) / (dd + 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r2 = byName("q324_tail_dependence").run(spark, plantDir("events" -> anti)).head()
    assert(r2.getAs[Double]("lambda_upper") == 0.0)
    assert(r2.getAs[Double]("lambda_lower") == 0.0)
  }

  test("q325: (1,1,10,1,1) has 6 recurrent pairs, 2 on diagonals") {
    import spark.implicits._
    val ev = series(Seq(1, 1, 10, 1, 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q325_rqa").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("n_rec") == 6L)
    assert(math.abs(r.getAs[Double]("recurrence_rate") - 0.6) < 1e-9)
    // only (1,4)<->(2,5) extend diagonally
    assert(math.abs(r.getAs[Double]("determinism") - 2.0 / 6) < 1e-6)
  }

  test("q326: the strict alternator pins SampEn = -ln(4/6)") {
    import spark.implicits._
    val ev = series(Seq(1, 5, 1, 5, 1, 5, 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q326_sample_entropy").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_days") == 7L)
    assert(r.getAs[Long]("b_count") == 6L)
    assert(r.getAs[Long]("a_count") == 4L)
    val exp = math.floor(-math.log(4.0 / 6.0) * 1e4 + 0.500001) / 1e4
    assert(r.getAs[Double]("sampen") == exp)
  }
}
