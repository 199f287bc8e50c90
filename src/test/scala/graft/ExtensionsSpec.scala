package graft

import org.apache.spark.sql.functions._

import graft.functions.Transforms

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_alphanum is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(s"SELECT graft_alphanum('Ab3-x9', '${Transforms.Pepper}')")
      .as[String].head()
    val viaColumn = Seq("Ab3-x9").toDF("v")
      .select(Transforms.alphanum(col("v"))).as[String].head()
    assert(viaSql == viaColumn)
    assert(viaSql(0).isUpper && viaSql(3) == '-')
  }

  test("the full custom-expression zoo is callable from SQL") {
    GraftExtensions.register(spark)
    val p = Transforms.Pepper
    // FPE agrees with the Column builder
    val fpeSql = spark.sql(s"SELECT graft_alphanum_unique('Cust42', '$p')").as[String].head()
    val fpeCol = Seq("Cust42").toDF("v")
      .select(Transforms.alphanumUnique(col("v"))).as[String].head()
    assert(fpeSql == fpeCol && fpeSql.length == 6)
    // two-pointer intersect kernel
    assert(spark.sql("SELECT graft_sorted_intersect(array(1L,3L,5L), array(3L,4L,5L))")
      .as[Int].head() == 2)
    // quantizer preserves length; values in [-127, 127]
    val q = spark.sql("SELECT graft_int8_quantize(array(0.5D, -1.0D, 0.25D))")
      .as[Seq[Double]].head()
    assert(q.length == 3 && q.forall(v => v >= -127 && v <= 127))
    // signature expressions accept literal int params and reject others
    assert(spark.sql("SELECT graft_simhash(split('a b c', ' '), 60, 15)")
      .as[Long].head() != 0L)
    assert(spark.sql("SELECT size(graft_shingle_set(split('a b c d', ' '), 3, 12))")
      .as[Int].head() == 2)
    intercept[Exception] {
      spark.sql("SELECT graft_simhash(split('a', ' '), 1 + 59, 15)").collect()
    }
  }
}
