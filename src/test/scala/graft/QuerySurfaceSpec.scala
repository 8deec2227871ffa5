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

  test("no query emits DecimalType — the driver-proven output surface") {
    // r13 regression class: three rows emitted DECIMAL(38,0) columns
    // and hash-failed the driver despite bit-identical values on both
    // engines (the driver's hasher canonicalizes decimal128 outputs
    // differently from its int64/double path). DECIMAL accumulation
    // stays INTERNAL; the emitted surface is int/long/double/string/
    // bool/binary/date/timestamp/array/map/struct thereof, never
    // decimal. This pins that contract so a hardening pass cannot
    // silently re-introduce the failure.
    import org.apache.spark.sql.types._
    def decimals(dt: DataType, path: String): Seq[String] = dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.toSeq.flatMap(f => decimals(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => decimals(a.elementType, s"$path[]")
      case m: MapType =>
        decimals(m.keyType, s"$path<key>") ++
          decimals(m.valueType, s"$path<val>")
      case _ => Nil
    }
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      decimals(fn(spark, dir).schema, name)
    }
    assert(offenders.isEmpty,
      s"DecimalType on the emitted surface (cast to bigint/double at " +
        s"the edge): ${offenders.mkString(", ")}")
  }

  test("every query has an oracle — zero rows-only entries") {
    // since round 5 even BPE training is oracle-checked (a DuckDB
    // recursive CTE replays the serial trainer), and the approx
    // queries certify their error contract in-query so the oracle can
    // replay exact values + TRUE — the driver surface is 100%
    // hash-gated
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without query: $orphaned")
  }

  test("approx distinct certification query asserts its bound per group") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_rsd"),
        s"${r.getAs[String]("event_type")}: HLL estimate outside 3×rsd " +
          s"of exact=${r.getAs[Long]("exact_users")}")
    }
  }

  test("raw HLL sketch lands within the error bound of exact") {
    import org.apache.spark.sql.functions._
    // independent check on the raw approx_count_distinct expression,
    // outside the certification query — keeps the original property
    // even if the certification wiring changes
    val rows = Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.05).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }
}
