package graft

import graft.operators.Sketches

/** Count-min sketch invariants at sf0.001, checked against a direct
  * recomputation: the estimate never undercounts, equals the minimum
  * over the token's cells, and the overestimate respects the εN bound
  * with ε = e/w (deterministic data + fixed hash family, so the
  * "with high probability" bound is simply checkable).
  */
class SketchesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("cms estimates: overestimate-only, exact min-of-cells, εN bound") {
    val rows = Sketches.cmsTokenCounts(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)

    // direct recomputation of the sketch from the raw corpus
    val toks = Tables(spark, dir, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).trim.split(" ").toSeq)
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def bucket(j: Int, tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((tok + s"#$j").getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % Sketches.cmsWidth
    }
    val cells = toks
      .flatMap(t => (0 until Sketches.cmsDepth).map(j => (j, bucket(j, t))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

    val n = toks.size.toLong
    val epsN = math.E / Sketches.cmsWidth * n
    assert(rows.map(_._1).toSet === exact.keySet)
    rows.foreach { case (tok, exactN, est) =>
      assert(exactN === exact(tok), s"exact count for $tok")
      val expectedEst = (0 until Sketches.cmsDepth)
        .map(j => cells((j, bucket(j, tok)))).min
      assert(est === expectedEst, s"min-of-cells for $tok")
      assert(est >= exactN, s"CMS must never undercount ($tok)")
      assert(est - exactN <= epsN,
        s"overestimate ${est - exactN} above eN=$epsN for $tok")
    }
    // width 16 vs a wider vocabulary: collisions must actually occur
    // somewhere, or the test is vacuous
    assert(rows.exists { case (_, exactN, est) => est > exactN },
      "expected at least one colliding bucket at width 16")
  }
}
