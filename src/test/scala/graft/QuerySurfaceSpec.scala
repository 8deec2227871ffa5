package graft

/** Smoke over every SparkEntry query at sf0.001: runs, non-degenerate
  * schema, and oracle coverage stays in lockstep with the query map.
  * (Value-level correctness is the driver's DuckDB gate, mirrored
  * locally by tools/check_correctness.py at sf0.01.)
  */
class QuerySurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001 with a sane schema") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("every query has an oracle (or is explicitly rows-only)") {
    // sketch values (HLL, positional-error histogram) are
    // engine-specific → rows-only driver check; BPE training is an
    // iterative driver loop DuckDB SQL cannot express (spec-verified
    // against a reference implementation instead)
    val rowsOnly = Set("q_approx_distinct", "q_approx_percentiles",
      "text_bpe_merges", "text_bpe_fertility")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without query: $orphaned")
  }

  test("approx distinct lands within the HLL error bound of exact") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    // exact counts computed here, NOT in the benched query — the sketch
    // must be benchmarked alone (VERDICT r1 finding #4)
    val exactByType = Tables(spark, dir, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = exactByType(r.getAs[String]("event_type")).toDouble
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }
}
