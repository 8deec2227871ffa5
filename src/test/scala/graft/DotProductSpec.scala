package graft

import graft.functions.DotProductD
import org.apache.spark.sql.functions._

/** Native dot-product expression: bit-parity with the higher-order
  * -function fold it replaces, null propagation, and plan presence.
  */
class DotProductSpec extends SparkSpec {

  test("bit-identical to the zip_with+aggregate fold on real embeddings") {
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val paired = emb.crossJoin(
      emb.select(col("vec_id").as("v2"), col("embedding").as("e2"))
        .limit(5))
    val hof = aggregate(
      zip_with(col("embedding"), col("e2"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val bad = paired
      .select(DotProductD(col("embedding"), col("e2")).as("native"), hof.as("ref"))
      .filter(col("native") =!= col("ref")) // bitwise: any ULP drift fails
    assert(bad.count() === 0)
  }

  test("null in either side propagates") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
    val out = df.select(DotProductD(col("a"), col("b")).as("d")).head()
    assert(out.isNullAt(0))
  }

  test("self dot product is the squared norm") {
    import spark.implicits._
    val df = Seq(Seq(3.0f, 4.0f)).toDF("a")
    assert(df.select(DotProductD(col("a"), col("a"))).head().getDouble(0) === 25.0)
  }
}
