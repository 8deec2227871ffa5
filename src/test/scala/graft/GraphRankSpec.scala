package graft

import graft.operators.{GraphRank, TextAnalysis}
import org.apache.spark.sql.functions._

/** Integer-exact PageRank over the duplication graph: the invariants
  * behind the oracle hash — mass conservation bounds, hub ordering,
  * and determinism of the fixed-point arithmetic.
  */
class GraphRankSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("nodes are exactly the documents appearing in overlap pairs") {
    val pr = GraphRank.pagerankDupGraph(spark, dir)
    val pairs = TextAnalysis.winnowPassagePairs(spark, dir)
    val nodes = pairs.select(col("a_id").as("id"))
      .unionAll(pairs.select(col("b_id").as("id"))).distinct()
    assert(pr.count() === nodes.count())
    assert(pr.select(col("doc_id").as("id")).exceptAll(nodes).count() === 0L)
  }

  test("ranks are dense, scores are teleport-bounded below and " +
    "ordering is (score desc, id)") {
    val pr = GraphRank.pagerankDupGraph(spark, dir).collect()
    pr.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i + 1L, "rank column is dense 1..N")
      // every node keeps at least the teleport mass
      assert(r.getLong(3) >= GraphRank.teleport)
    }
    pr.sliding(2).foreach {
      case Array(a, b) =>
        val (sa, sb) = (a.getLong(3), b.getLong(3))
        assert(sa > sb || (sa == sb && a.getLong(1) < b.getLong(1)))
      case _ =>
    }
  }

  test("total rank mass stays within teleport/damping bounds") {
    val pr = GraphRank.pagerankDupGraph(spark, dir)
    val n = pr.count()
    val total = pr.agg(sum("pr_scaled")).head().getLong(0)
    // with symmetric edges every contribution lands on a node, so mass
    // stays near n*scale; floor divisions only ever LOSE mass
    assert(total <= n * GraphRank.prScale)
    assert(total > n * GraphRank.teleport)
  }

  test("a hub outranks a leaf attached to it") {
    // highest-degree node must not be ranked last; determinism under
    // recomputation
    val pr1 = GraphRank.pagerankDupGraph(spark, dir)
    val maxDeg = pr1.agg(max("deg")).head().getLong(0)
    val n = pr1.count()
    val hubRank = pr1.filter(col("deg") === maxDeg)
      .agg(min("rank")).head().getLong(0)
    assert(hubRank < n, "the best-connected node cannot be the worst-ranked")
    val pr2 = GraphRank.pagerankDupGraph(spark, dir)
    assert(pr1.exceptAll(pr2).count() === 0L)
  }

  test("triangle census: hand graph with one triangle, a closing edge, a pendant") {
    import spark.implicits._
    // K3 on {1,2,3}; edge 3-4 pendant; edges 4-5, 3-5 close a second
    // triangle {3,4,5}
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 5L))
      .toDF("a_id", "b_id")
    val r = GraphRank.triangleStatsOf(e).collect().head
    assert(r.getAs[Long]("n_nodes") === 5L)
    assert(r.getAs[Long]("n_edges") === 6L)
    assert(r.getAs[Long]("triangles") === 2L)
    // degrees: 2,2,4,2,2 -> wedges = 1+1+6+1+1 = 10
    assert(r.getAs[Long]("wedges") === 10L)
    assert(r.getAs[Double]("clustering") === 0.6) // 3*2/10
  }

  test("triangle census: triangle-free chain counts zero with defined clustering") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a_id", "b_id")
    val r = GraphRank.triangleStatsOf(e).collect().head
    assert(r.getAs[Long]("triangles") === 0L)
    assert(r.getAs[Long]("wedges") === 2L)
    assert(r.getAs[Double]("clustering") === 0.0)
  }

  test("triangle census: empty graph yields NULL clustering, zero counts") {
    import spark.implicits._
    val e = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val r = GraphRank.triangleStatsOf(e).collect().head
    assert(r.getAs[Long]("n_nodes") === 0L)
    assert(r.getAs[Long]("triangles") === 0L)
    assert(r.isNullAt(r.fieldIndex("clustering")))
  }
}
