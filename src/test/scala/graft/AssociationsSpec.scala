package graft

import org.apache.spark.sql.functions._

/** Certifies the A-priori pruned frequent-triple join against the
  * literal triple census at sf0.001 (the prunes must be pure work
  * savings — downward closure says they cannot change the floor-cut
  * result), and the lift chart against definitional decile arithmetic
  * over the collected scored frame.
  */
class AssociationsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pruned triples equal the brute-force triple census") {
    val got = operators.Associations.basketTriples(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getAs[Long]("n_all"), r.getAs[Long]("n_p12"))))
      .toMap
    val baskets = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (_, v) => v.map(_._2).sorted.toVector }
    val floor = operators.Associations.pairSupportFloor
    val tripleCnt = scala.collection.mutable.Map
      .empty[(Long, Long, Long), Long]
    val pairCnt = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.foreach { b =>
      for (i <- b.indices; j <- (i + 1) until b.size) {
        pairCnt((b(i), b(j))) = pairCnt.getOrElse((b(i), b(j)), 0L) + 1
        for (k <- (j + 1) until b.size)
          tripleCnt((b(i), b(j), b(k))) =
            tripleCnt.getOrElse((b(i), b(j), b(k)), 0L) + 1
      }
    }
    val brute = tripleCnt.filter(_._2 >= floor)
      .map { case (t, n) => t -> (n, pairCnt((t._1, t._2))) }.toMap
    assert(got === brute)
    assert(got.nonEmpty, "sf0.001 baskets must yield frequent triples")
  }

  test("triple support/confidence are the stated single divisions") {
    val rows = operators.Associations.basketTriples(spark, dir).collect()
    val nb = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey")).distinct().count()
    rows.foreach { r =>
      val nAll = r.getAs[Long]("n_all"); val nP12 = r.getAs[Long]("n_p12")
      assert(nAll <= nP12, "a triple can never outnumber its sub-pair")
      assert(math.abs(r.getAs[Double]("support") -
        nAll.toDouble / nb) < 5e-7)
      assert(math.abs(r.getAs[Double]("confidence") -
        nAll.toDouble / nP12) < 5e-7)
    }
  }

  test("lift chart deciles account for every document exactly once") {
    val rows = operators.Evaluation.liftChart(spark, dir).collect()
    val scored = operators.Perceptron.classifier(spark, dir)
      .select(col("doc_id"), col("score"), col("is_en"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val n = scored.length.toLong
    val totalPos = scored.count(_._3).toLong
    assert(rows.map(_.getAs[Long]("n_docs")).sum === n)
    assert(rows.map(_.getAs[Long]("n_pos")).sum === totalPos)
    assert(rows.map(_.getAs[Long]("decile")).toSeq ===
      rows.map(_.getAs[Long]("decile")).toSeq.sorted)
    // definitional replay: rank by (score desc, doc_id asc), integer
    // decile grid, cumulative counts
    val ranked = scored.sortBy(t => (-t._2, t._1)).zipWithIndex
      .map { case ((_, _, pos), i) => ((i.toLong * 10) / n + 1, pos) }
    val perDecile = ranked.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.count(_._2).toLong)).toMap
    var cumD = 0L; var cumP = 0L
    rows.foreach { r =>
      val d = r.getAs[Long]("decile")
      val (nd, np) = perDecile(d)
      assert(r.getAs[Long]("n_docs") === nd)
      assert(r.getAs[Long]("n_pos") === np)
      cumD += nd; cumP += np
      assert(r.getAs[Long]("cum_docs") === cumD)
      assert(r.getAs[Long]("cum_pos") === cumP)
      assert(math.abs(r.getAs[Double]("capture") -
        cumP.toDouble / totalPos) < 5e-7)
      assert(math.abs(r.getAs[Double]("lift") -
        (cumP * n).toDouble / (cumD * totalPos)) < 5e-7)
    }
    // the full-corpus row closes the books: capture 1, lift 1
    val last = rows.last
    assert(last.getAs[Long]("cum_docs") === n)
    assert(last.getAs[Double]("capture") === 1.0)
    assert(last.getAs[Double]("lift") === 1.0)
  }
}
