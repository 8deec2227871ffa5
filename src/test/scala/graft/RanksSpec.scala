package graft

import graft.operators.Ranks
import org.apache.spark.sql.functions._

/** Direct contracts of the distributed rank helpers — in particular
  * [[Ranks.globalTagged]]'s tag-straddling partitions: with more tags
  * than fit one partition per tag, range partitions MUST straddle tag
  * boundaries (the counts and window key on (partition, tag) exactly
  * for this), and every tag's ranks must still be the dense 1..n of
  * its own total order.
  */
class RanksSpec extends SparkSpec {

  test("globalTagged == per-tag row_number reference, straddled boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 5 tags x 40 rows over 4 shuffle partitions — tags straddle
    val rows = for (t <- Seq("a", "b", "c", "d", "e"); i <- 0 until 40)
      yield (t, i.toLong, rnd.nextInt(7).toDouble) // heavy score ties
    val df = rows.toDF("t", "id", "v")
    val got = Ranks.globalTagged(df, "t", "rk",
      col("v").desc, col("id").asc)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val expect = rows.groupBy(_._1).flatMap { case (t, xs) =>
      xs.sortBy { case (_, id, v) => (-v, id) }.zipWithIndex
        .map { case ((_, id, _), i) => (t, id) -> (i + 1L) }
    }
    assert(got === expect)
  }

  test("prefixMax == exclusive running max reference, incl. NULL head") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // enough rows to spread over every shuffle partition, value ties
    // and a non-trivial order so partition boundaries are exercised
    val rows = (0L until 500L).map(i => (i, rnd.nextInt(50).toLong))
    val df = rows.toDF("id", "v").repartition(7)
    val got = Ranks.prefixMax(df, "v", "m", col("id").desc)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // reference: exclusive running max in id-DESC order
    var acc: Option[Long] = None
    val expect = rows.sortBy(-_._1).map { case (id, v) =>
      val o = acc
      acc = Some(acc.fold(v)(_ max v))
      id -> o
    }.toMap
    assert(got === expect)
    assert(got(499L) === None, "global first row has no predecessor")
    // degenerate: empty frame, single row
    assert(Ranks.prefixMax(Seq.empty[(Long, Long)].toDF("id", "v"),
      "v", "m", col("id").asc).count() === 0L)
    val one = Ranks.prefixMax(Seq((1L, 5L)).toDF("id", "v"),
      "v", "m", col("id").asc).head()
    assert(one.isNullAt(2))
  }

  test("globalTagged: empty frame ranks to empty, single tag matches global") {
    import spark.implicits._
    assert(Ranks.globalTagged(
      Seq.empty[(String, Long, Double)].toDF("t", "id", "v"),
      "t", "rk", col("v").desc, col("id").asc).count() === 0L)
    val df = (0L until 25L).map(i => ("only", i, (i * 37 % 11).toDouble))
      .toDF("t", "id", "v")
    val viaTagged = Ranks.globalTagged(df, "t", "rk",
      col("v").desc, col("id").asc)
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaGlobal = Ranks.global(df, "rk", col("v").desc, col("id").asc)
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaTagged === viaGlobal)
  }
}
