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
}
