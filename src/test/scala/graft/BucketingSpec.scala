package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located join: the write-once shuffle pays off as an
  * Exchange-free join plan, with results identical to the plain join.
  */
class BucketingSpec extends SparkSpec {

  test("partitioned layout prunes directories at planning time") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = Tables(spark, dir, "events")
      .withColumn("event_date", to_date(col("ts")))
    Bucketing.writePartitioned(events, out, "event_date")

    val pruned = spark.read.parquet(out)
      .filter(col("event_date") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:"), plan)
    assert(plan.contains("event_date"), plan)
    // the scan touches exactly one of the ~30 date partitions
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned === Some(1), s"expected 1 partition scanned, got $scanned")
    // and the rows match the unpartitioned filter
    assert(pruned.count() ===
      events.filter(col("event_date") === "2024-01-05").count())
  }

  test("partitionPrunedDay: query scans exactly one day directory") {
    val df = Bucketing.partitionPrunedDay(spark, "/root/testdata/sf0.001")
    // sparkPlan, not executedPlan: AQE wraps the agg query and hides
    // the scan leaf from collectLeaves until execution
    val scanned = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned === Some(1), s"expected 1 partition scanned, got $scanned")
    assert(df.count() > 0)
  }

  test("dynamic partition pruning: runtime filter from a dim join reaches the scan") {
    import spark.implicits._
    val layout = Bucketing.prepareDayLayout(spark, "/root/testdata/sf0.001")
    val facts = spark.read.parquet(layout)
    // dim known only at runtime (from the optimizer's view): the day
    // filter sits on the dim side, so static pruning can't fire — DPP
    // must inject the runtime IN-subquery into the scan's
    // PartitionFilters for the fact side to skip 29 of 30 day dirs.
    // The dim is a parquet table, not a LocalRelation: the optimizer
    // folds filters into LocalTableScan, leaving no selective
    // predicate for the PartitionPruning rule to key on
    val dimPath = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq(
      (java.sql.Date.valueOf("2024-01-15"), "pick"),
      (java.sql.Date.valueOf("2025-06-01"), "skip")).toDF("day", "tag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = facts.join(dim.filter(col("tag") === "pick"), "day")
      .groupBy(col("tag")).agg(count(lit(1)).as("n"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter in the scan:\n$p")
    assert(joined.collect().map(_.getLong(1)).sum > 0)
  }

  test("layout pruning: stale same-source versions reclaimed after grace, others kept") {
    // exercise via the public API: prepare a layout, then plant
    // sibling dirs that model each pruning case and re-prepare
    val layoutPath = new java.io.File(
      Bucketing.prepareDayLayout(spark, "/root/testdata/sf0.001"))
    val parent = layoutPath.getParentFile
    val prefix = layoutPath.getName.split("_").dropRight(1).mkString("_")
    def plant(name: String, ageMs: Long): java.io.File = {
      val d = new java.io.File(parent, name)
      d.mkdirs()
      d.setLastModified(System.currentTimeMillis() - ageMs)
      d
    }
    val staleOld = plant(s"${prefix}_deadbeef", 2L * 60 * 60 * 1000)
    val staleFresh = plant(s"${prefix}_cafebabe", 0)
    val otherSource = plant("graft_events_by_day_ffff_eeee", 2L * 60 * 60 * 1000)
    // force a re-prepare pass by removing the current layout's marker
    new java.io.File(layoutPath, "_SUCCESS").delete()
    Bucketing.prepareDayLayout(spark, "/root/testdata/sf0.001")
    assert(!staleOld.exists(), "old same-source version must be reclaimed")
    assert(staleFresh.exists(), "fresh same-source version keeps its grace period")
    assert(otherSource.exists(), "other sources' layouts are never touched")
    staleFresh.delete(); otherSource.delete()
  }

  test("z-order layout: files prune on either dimension; single-dim sort cannot") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val zOut = new java.io.File(sys.props("java.io.tmpdir"), "graft_zorder_test")
    val dayOut = new java.io.File(sys.props("java.io.tmpdir"), "graft_daysort_test")
    try {
      Bucketing.zorderWrite(spark, dir, zOut.getPath)
      // contrast layout: same file count, sorted by day only
      Tables(spark, dir, "events")
        .withColumn("day_idx",
          datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("2024-01-01"))))
        .withColumn("type_idx",
          pmod(crc32(col("event_type").cast("binary")), lit(8)).cast("int"))
        .repartitionByRange(8, col("day_idx"))
        .sortWithinPartitions(col("day_idx"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dayOut.getPath)

      // per-file [min, max] of the type bucket = the footer stats a
      // reader would consult for a type-only predicate
      def typeRanges(path: String): Array[(Int, Int)] =
        spark.read.parquet(path)
          .groupBy(input_file_name())
          .agg(min("type_idx").as("lo"), max("type_idx").as("hi"))
          .collect().map(r => (r.getInt(1), r.getInt(2)))
      val zRanges = typeRanges(zOut.getPath)
      val dayRanges = typeRanges(dayOut.getPath)
      val probe = 0 // a type bucket that exists (crc32 spreads 5 types over 8)
      def skipped(rs: Array[(Int, Int)]) =
        rs.count { case (lo, hi) => probe < lo || probe > hi }
      // day-sorted stripes contain every type: nothing skippable
      assert(skipped(dayRanges) === 0, dayRanges.mkString(","))
      // z-order files cover type sub-ranges: a type-only predicate
      // skips a real fraction of files on stats alone
      assert(skipped(zRanges) * 4 >= zRanges.length,
        s"expected >=25% of files skippable, got ${skipped(zRanges)}/${zRanges.length}: " +
          zRanges.mkString(","))
      // and day predicates still prune: a late-day probe must miss at
      // least one file's [min_day, max_day]
      val zDayRanges = spark.read.parquet(zOut.getPath)
        .groupBy(input_file_name())
        .agg(min("day_idx").as("lo"), max("day_idx").as("hi"))
        .collect().map(r => (r.getInt(1), r.getInt(2)))
      val lateDay = zDayRanges.map(_._2).max
      assert(zDayRanges.count { case (lo, hi) => lateDay < lo || lateDay > hi } >= 1,
        s"day stats must stay selective under z-order: ${zDayRanges.mkString(",")}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(zOut); rm(dayOut)
    }
  }

  test("zValue is a bijection: de-interleaving recovers both coordinates") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(20240812)
    val pairs = Seq.fill(1000)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = pairs.toDF("a", "b")
      .withColumn("z", Bucketing.zValue(col("a"), col("b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def extract(z: Long, offset: Int): Long =
      (0 until 16).map(j => ((z >> (2 * j + offset)) & 1L) << j).sum
    got.foreach { case (a, b, z) =>
      assert(extract(z, 0) === a && extract(z, 1) === b, s"z=$z")
    }
    // distinct inputs stay distinct through the curve
    assert(got.map(_._3).distinct.length === pairs.distinct.length)
  }

  test("MERGE over a bucketed target adds zero target-side exchanges") {
    // proves the MergeInto doc claim: the full-outer apply join pays
    // the key shuffle ONCE for the (small) collapsed change set; a
    // target laid out bucketed on the merge key joins in place — the
    // nightly-apply shape where re-shuffling the big table every run
    // is the cost that matters at scale
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir, "events")
      .select("user_id", "event_id", "event_type", "value")
    val state = operators.VersionedUpsert.latestRows(
      events, Seq("user_id"), Seq(col("event_id").desc))
    Bucketing.writeBucketed(state, "merge_target_b", "user_id", 4)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.toString
          .split("Exchange hashpartitioning").length - 1
      val overBucketed = operators.MergeInto(
        spark.table("merge_target_b"), events,
        key = "user_id", versionCol = "event_id",
        deleteWhen = col("event_type") === "error")
      val overPlain = operators.MergeInto(
        state, events,
        key = "user_id", versionCol = "event_id",
        deleteWhen = col("event_type") === "error")
      // shuffle budget: source collapse + its join exchange only — the
      // bucketed target side reads matching buckets in place, while
      // the plain target pays one more full-table exchange
      assert(exchanges(overBucketed) === exchanges(overPlain) - 1,
        "bucketed target must save exactly the target-side exchange")
      val plan = overBucketed.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"target scan must be bucket-aware:\n$plan")
      // same merged state either way
      val a = overBucketed.orderBy("user_id").collect().map(_.toString)
      val b = overPlain.orderBy("user_id").collect().map(_.toString)
      assert(a.sameElements(b))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS merge_target_b")
    }
  }

  test("same-bucketed tables join with zero exchanges") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    Bucketing.writeBucketed(
      orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      "orders_b", "o_custkey", 4)
    Bucketing.writeBucketed(
      customer.select(col("c_custkey").as("o_custkey"), col("c_name")),
      "customer_b", "o_custkey", 4)
    // force a non-broadcast plan so the bucketed sort-merge path shows
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "customer_b", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // identical result set to the plain join
      val expected = orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
