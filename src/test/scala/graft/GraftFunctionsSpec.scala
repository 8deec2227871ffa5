package graft

import graft.functions.{DotProductD, GraftExtensions, GraftFunctions, NgramMinHashAffine, NgramMinHashMd5, RollingHash}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** The SQL function surface must agree with the Column API it wraps —
  * a spark.sql user and a DataFrame user get the same kernels.
  */
class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions == Column API, all four kernels") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("the quick brown fox jumps over it", Seq(0.5f, -1.5f, 2.0f)))
      .toDF("s", "v").createOrReplaceTempView("gf")

    val viaSql = spark.sql(
      """SELECT ngram_minhash_md5(s, 8, 4) AS m,
        |       ngram_minhash_affine(s, 8, 8) AS a,
        |       rolling_hash(s, 16) AS r,
        |       dot_product_d(v, v) AS d
        |FROM gf""".stripMargin).collect().head
    val viaCol = spark.table("gf").select(
      NgramMinHashMd5.signature(col("s"), 8, 4).as("m"),
      NgramMinHashAffine.signature(col("s"), 8, 8).as("a"),
      RollingHash.of(col("s"), 16).as("r"),
      DotProductD(col("v"), col("v")).as("d")).collect().head

    assert(viaSql.getSeq[String](0) === viaCol.getSeq[String](0))
    assert(viaSql.getSeq[Long](1) === viaCol.getSeq[Long](1))
    assert(viaSql.getSeq[Long](2) === viaCol.getSeq[Long](2))
    assert(viaSql.getDouble(3) === viaCol.getDouble(3))
  }

  test("static parameters must be integer literals") {
    GraftFunctions.register(spark)
    spark.range(1).selectExpr("CAST(id AS STRING) AS s")
      .createOrReplaceTempView("gf_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT ngram_minhash_md5(s, length(s), 4) FROM gf_bad").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("GraftExtensions injects without error (session-build path)") {
    new GraftExtensions().apply(new SparkSessionExtensions())
  }
}
