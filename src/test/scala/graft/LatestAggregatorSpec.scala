package graft

import graft.operators.{LatestAggregator, MvTransform, VersionedUpsert}
import graft.schema.ChangeEvent.Booking
import graft.sources.WorkloadFixture

/** The typed single-shuffle argmax must agree with the window-based
  * finalView — on the golden workload and on duplicated (at-least-once
  * replayed) input.
  */
class LatestAggregatorSpec extends SparkSpec {

  private def golden(ds: org.apache.spark.sql.Dataset[Booking]) =
    ds.collect().map(b => (b.booking_id, b.status, b.version)).sortBy(_._1).toSeq

  test("typed aggregator finalView == window finalView on the workload") {
    import spark.implicits._
    val log = MvTransform(WorkloadFixture.toDf(spark)).as[Booking]
    val typed = golden(LatestAggregator.finalView(log))
    val window = golden(VersionedUpsert.finalView(log.toDF()).as[Booking])
    assert(typed === window)
    assert(typed.map(_._1) ===
      Seq("b1", "b10", "b2", "b7", "b8", "b9"))
  }

  test("idempotent under full replay (duplicated log)") {
    import spark.implicits._
    val log = MvTransform(WorkloadFixture.toDf(spark)).as[Booking]
    val doubled = log.union(log)
    assert(golden(LatestAggregator.finalView(doubled)) ===
      golden(LatestAggregator.finalView(log)))
  }

  test("null modified_at tiebreak: non-null wins in either argument order") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val withTs = Booking("b1", "withTs", 0, is_canceled = false, ts, ts, 5L)
    val noTs = Booking("b1", "noTs", 0, is_canceled = false, ts, null, 5L)
    // same version, same is_deleted — the window form's `desc` (NULLS
    // LAST) prefers the non-null row; the typed order must agree
    // regardless of encounter order.
    assert(VersionedUpsert.newer(withTs, noTs))
    assert(!VersionedUpsert.newer(noTs, withTs))
    // full order-key tie: still a strict total order (never both ways)
    val twinA = noTs
    val twinB = noTs.copy(status = "zz")
    assert(VersionedUpsert.newer(twinA, twinB) !==
      VersionedUpsert.newer(twinB, twinA))
  }
}
