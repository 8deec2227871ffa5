package graft

import graft.operators.Temporal

/** Property: for ANY sets of left/right timed rows, [[Temporal.asofJoin]]
  * equals a serial in-memory reference fold — per left row, the right
  * row with the same key and the greatest time <= the left time.
  * (Plain seeded loops: the scalatestplus ScalaCheck bridge is not in
  * the offline dependency cache.)
  */
class AsOfPropertySpec extends SparkSpec {

  private def reference(left: Seq[(Long, Long, String)],
                        right: Seq[(Long, Long, String)]): Set[(String, Option[String])] =
    left.map { case (k, t, name) =>
      val m = right.filter(r => r._1 == k && r._2 <= t)
      name -> (if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
    }.toSet

  test("asofJoin agrees with the serial reference on random workloads") {
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // distinct (key, time) pairs per side so the match is unique
      def gen(prefix: String, n: Int): Seq[(Long, Long, String)] =
        rnd.shuffle((0 until n).map { i =>
          (rnd.nextInt(4).toLong, rnd.nextInt(50).toLong, s"$prefix$i")
        }).distinctBy(r => (r._1, r._2))
      val lefts = gen("l", 40)
      val rights = gen("r", 30)

      val out = Temporal.asofJoin(
        lefts.toDF("k", "t", "l_name"),
        rights.toDF("k", "t", "r_name"),
        "k", "t", "t")
        .collect()
        .map(r => r.getAs[String]("l_name") -> Option(r.getAs[String]("r_name")))
        .toSet
      assert(out === reference(lefts, rights), s"seed=$seed")
    }
  }
}
