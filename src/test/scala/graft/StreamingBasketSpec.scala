package graft

import graft.operators.Associations
import org.apache.spark.sql.functions._

/** Streaming pair-count parity: the stateless array expansion + running
  * count must reproduce, per pair, the batch self-join formulation over
  * the same baskets — two independent derivations of one number.
  */
class StreamingBasketSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streaming pair counts equal the batch self-join per pair") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    // CDC-compacted basket form: distinct item ids, sorted ascending
    val baskets = Tables(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
      .select("items").as[Seq[Long]].collect()

    val in = MemoryStream[Seq[Long]]
    val q = streaming.StreamingBasket.pairCounts(in.toDF().toDF("items"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("basketpairs").start()
    try {
      val (w1, w2) = baskets.splitAt(baskets.length / 2)
      in.addData(w1.toSeq); q.processAllAvailable()
      in.addData(w2.toSeq); q.processAllAvailable()
      val got = spark.table("basketpairs").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

      // batch formulation: the distinct-items self-join on the order key
      val items = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val batch = items.as("a")
        .join(items.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
        .agg(count(lit(1)).as("n_both"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap

      assert(got.size === batch.size, "pair universe must match")
      batch.foreach { case (k, n) =>
        assert(got.getOrElse(k, -1L) === n, s"pair $k")
      }
    } finally q.stop()
  }

  test("expansion is canonical: C(k,2) pairs, p1 < p2, duplicates counted once") {
    import spark.implicits._
    val one = Seq(Seq(5L, 9L, 11L, 20L)).toDF("items")
    val rows = streaming.StreamingBasket.pairCounts(one)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 6, "C(4,2) pairs")
    assert(rows.forall { case (p1, p2, n) => p1 < p2 && n === 1L })
  }

  test("batch marketBasket floor: every reported pair clears the support floor") {
    val out = Associations.marketBasket(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_both")
      assert(n >= Associations.pairSupportFloor.toLong)
      assert(r.getAs[Long]("n_p1") >= n && r.getAs[Long]("n_p2") >= n,
        "item counts dominate the pair count (downward closure)")
      assert(r.getAs[Long]("p1") < r.getAs[Long]("p2"))
    }
  }
}
