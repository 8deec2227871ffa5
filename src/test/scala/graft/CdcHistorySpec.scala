package graft

import graft.operators.{CdcHistory, Dedup, EventsCdc, Sampling, VersionedUpsert}
import org.apache.spark.sql.functions._

/** Temporal log derivations (SCD2 / time travel / snapshot changefeed),
  * Bloom incremental dedup, and the per-source cap: invariants the
  * DuckDB hash oracle cannot express — interval tiling, consistency
  * with the FINAL view, equivalence to an independently-constructed
  * two-snapshot join, the Bloom no-false-negative guarantee, and the
  * cap's best-first ordering.
  */
class CdcHistorySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("scd2: intervals tile each key's timeline; one open interval per key") {
    val h = CdcHistory.scd2History(spark, dir).cache()
    try {
      val n = Tables(spark, dir, "events").count()
      assert(h.count() === n, "one interval per change event")
      // exactly one open (is_current) interval per key
      val open = h.filter(col("is_current")).groupBy("user_id").count()
      assert(open.filter(col("count") =!= 1).isEmpty, "one open interval per key")
      // valid_to of interval i == valid_from of interval i+1 (tiling):
      // re-deriving the lead must reproduce the stored valid_to
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
      val retiled = h.withColumn("next_from", lead(col("valid_from"), 1).over(w))
      assert(retiled.filter(
        !(col("valid_to") <=> col("next_from"))).isEmpty, "intervals tile")
      // the open interval per key is the FINAL row (max version)
      val openRows = h.filter(col("is_current"))
        .select(col("user_id"), col("valid_from").as("event_id"))
      val finalRows = VersionedUpsert.latestRows(
        Tables(spark, dir, "events").select("user_id", "event_id"),
        Seq("user_id"), Seq(col("event_id").desc))
      assert(openRows.exceptAll(finalRows).isEmpty &&
        finalRows.exceptAll(openRows).isEmpty, "open interval == FINAL row")
    } finally h.unpersist()
  }

  test("asOf at the head == the plain FINAL view; asOf cut is a prefix read") {
    val events = Tables(spark, dir, "events")
      .select("user_id", "event_id", "event_type", "value")
    val atHead = CdcHistory.asOfFinalOf(events, divisor = 1)
    val fin = EventsCdc.latestEvents(spark, dir)
    assert(atHead.exceptAll(fin).isEmpty && fin.exceptAll(atHead).isEmpty)
    // the half-cut view never exposes a version above the cut
    val half = CdcHistory.asOfFinal(spark, dir)
    val cut = events.agg(max("event_id")).head.getLong(0) / 2
    assert(half.filter(col("event_id") > cut).isEmpty)
  }

  test("snapshotDiff == independently-constructed two-snapshot full-outer join") {
    val events = Tables(spark, dir, "events")
      .select("user_id", "event_id", "event_type")
    val mx = events.agg(max("event_id")).head.getLong(0)
    val (v1, v2) = (mx / 3, mx * 2 / 3)
    def finalAt(v: Long) = VersionedUpsert.latestRows(
      events.filter(col("event_id") <= v), Seq("user_id"),
      Seq(col("event_id").desc))
    // reference: materialize both snapshots, full-outer join, classify
    val o = finalAt(v1).select(col("user_id"),
      col("event_id").as("o_ver"), col("event_type").as("o_type"))
    val n = finalAt(v2).select(col("user_id"),
      col("event_id").as("n_ver"), col("event_type").as("n_type"))
    val op = col("o_ver").isNotNull && col("o_type") =!= "error"
    val np = col("n_type") =!= "error"
    val expected = n.join(o, Seq("user_id"), "left")
      .select(col("user_id"),
        when(!op && np, "insert").when(op && !np, "delete")
          .when(op && np && col("o_ver") =!= col("n_ver"), "update").as("change"),
        col("o_ver").as("old_version"), col("n_ver").as("new_version"))
      .filter(col("change").isNotNull)
    val actual = CdcHistory.snapshotDiff(spark, dir)
    assert(actual.exceptAll(expected).isEmpty &&
      expected.exceptAll(actual).isEmpty)
    assert(actual.count() > 0, "the diff window must not be empty at sf0.001")
  }

  test("snapshotDiff classifies insert / update / delete / re-insert; drops unchanged") {
    import spark.implicits._
    // key 1: update (v1→v2 changes), key 2: delete, key 3: insert,
    // key 4: unchanged (no row), key 5: re-insert after old tombstone
    val log = Seq(
      (1L, 1L, "click"), (1L, 15L, "view"),      // update: 1 → 15
      (2L, 2L, "click"), (2L, 16L, "error"),     // delete at 16
      (3L, 17L, "signup"),                       // insert (no ≤v1 row)
      (4L, 3L, "click"),                         // unchanged
      (5L, 4L, "error"), (5L, 18L, "signup")     // re-insert over tombstone
    ).toDF("user_id", "event_id", "event_type")
    val cuts = Seq((10L, 20L)).toDF("v1", "v2")
    val out = CdcHistory.snapshotDiffAt(log, cuts)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "update", 2L -> "delete",
      3L -> "insert", 5L -> "insert"))
  }

  test("bloom: no false negatives — every exact dup is flagged maybe_dup") {
    val out = Dedup.bloomIncremental(spark, dir).cache()
    try {
      assert(out.filter(col("is_dup") && !col("maybe_dup")).isEmpty,
        "Bloom must never miss a true duplicate")
      // batch size: every 10th doc
      val batch = Tables(spark, dir, "documents")
        .filter(col("doc_id") % 10 === 0).count()
      assert(out.count() === batch)
    } finally out.unpersist()
  }

  test("bloom: seeded duplicate is caught; disjoint digests stay clean at tiny n") {
    import spark.implicits._
    // corpus ids 1-9 (inserted), batch ids 10,20: id 10 duplicates id 3
    val docs = ((1L to 9L).map(i => (i, s"corpus document number $i")) ++
      Seq((10L, "corpus document number 3"), (20L, "a fresh unseen text")))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("bloom").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.bloomIncremental(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSet
    assert(out.contains((10L, true, true)), "exact dup flagged by both paths")
    // 9 corpus docs → m = 256 (smallest pow2 ≥ 16·9): ≤36 of 256 bits
    // set, P(all 4 fresh probes hit) ≈ (36/256)^4 ≈ 4e-4 — and the
    // fixture is fixed, so this is deterministic, not probabilistic
    assert(out.contains((20L, false, false)), "fresh text passes the filter")
  }

  test("bloom sizing rule: smallest power of two ≥ 16·n, capped at the slice width") {
    assert(Dedup.bloomBitsFor(0L) === 2L)
    assert(Dedup.bloomBitsFor(9L) === 256L)
    assert(Dedup.bloomBitsFor(450L) === 8192L)
    assert(Dedup.bloomBitsFor(4096L) === 65536L)
    assert(Dedup.bloomBitsFor(1000000L) === Dedup.bloomBitsCap.toLong,
      "past the cap a deployment widens the digest slices")
  }

  test("source cap: at most N per source, best-first by token count") {
    val capped = Sampling.sourceCap(spark, dir, perSource = 5).cache()
    try {
      val per = capped.groupBy("source").count()
      assert(per.filter(col("count") > 5).isEmpty)
      // every source with ≥5 docs is fully capped
      val srcSizes = Tables(spark, dir, "documents").groupBy("source").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val kept = per.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      srcSizes.foreach { case (s, n) =>
        assert(kept(s) === math.min(5L, n), s"source $s")
      }
      // kept docs dominate dropped docs on the ranking signal
      val minKept = capped.groupBy("source").agg(min("n_tokens").as("mn"))
      val dropped = Tables(spark, dir, "documents")
        .withColumn("n_tokens",
          size(split(trim(col("text")), " ")).cast("long"))
        .join(capped.select("doc_id").withColumn("k", lit(1)),
          Seq("doc_id"), "left_anti")
      val violations = dropped.join(minKept, "source")
        .filter(col("n_tokens") > col("mn"))
      assert(violations.isEmpty,
        "no dropped doc out-scores a kept doc in its source")
    } finally capped.unpersist()
  }
}
