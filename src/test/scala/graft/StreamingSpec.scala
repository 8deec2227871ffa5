package graft

import graft.operators.VersionedUpsert
import graft.sources.WorkloadFixture
import graft.streaming.CdcPipeline
import java.nio.file.Files

/** End-to-end streaming: change events land in a directory; the pipeline
  * incrementally transforms and appends; finalView over the produced log
  * matches the golden table — including across two separate micro-batch
  * waves (incremental-view-maintenance contract, SURVEY.md T2).
  */
class StreamingSpec extends SparkSpec {

  test("streamed workload → finalView golden table, incrementally") {
    val root = Files.createTempDirectory("graft-stream").toString
    val changes = s"$root/changes"
    val bookings = s"$root/bookings"
    val ckpt = s"$root/ckpt"

    val evts = WorkloadFixture.events
    val (wave1, wave2) = evts.splitAt(evts.size / 2)

    // wave 1 lands, pipeline drains it
    WorkloadFixture.toDf(spark, wave1).write.mode("append").parquet(changes)
    CdcPipeline.runOnce(spark, changes, bookings, ckpt)
    val mid = VersionedUpsert.finalView(spark.read.parquet(bookings))
    assert(mid.count() > 0)

    // wave 2 lands, a NEW query resumes from the checkpoint and
    // processes only the new files
    WorkloadFixture.toDf(spark, wave2).write.mode("append").parquet(changes)
    CdcPipeline.runOnce(spark, changes, bookings, ckpt)

    val fv = VersionedUpsert.finalView(spark.read.parquet(bookings))
    val got = fv.select("booking_id", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got === Seq(
      ("b1", "Open"), ("b10", "Completed"), ("b2", "Created"),
      ("b7", "Completed"), ("b8", "Cancelled"), ("b9", "Cancelled")))

    // a fresh checkpoint reprocesses every change file and appends
    // duplicates — an at-least-once double delivery; finalView unchanged
    CdcPipeline.runOnce(spark, changes, bookings, s"$root/ckpt2")
    val replayed = VersionedUpsert.finalView(spark.read.parquet(bookings))
    assert(replayed.count() === 6L)
  }
}
