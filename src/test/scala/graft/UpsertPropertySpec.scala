package graft

import graft.operators.{MvTransform, VersionedUpsert}
import graft.schema.ChangeEvent._
import graft.sources.WorkloadFixture
/** Property: for ANY sequence of change events, `finalView(MvTransform(log))`
  * equals a sequential in-memory fold of the same events — the
  * simulated-PG truth (SURVEY.md §5). This is the correctness core of
  * the ReplacingMergeTree re-expression: the distributed argmax collapse
  * must agree with serial replay regardless of key set, op mix, or
  * arrival order. (Plain seeded loop: the scalatestplus bridge is not in
  * the offline dependency cache, so no ScalaCheck DSL.)
  */
class UpsertPropertySpec extends SparkSpec {

  private val baseMicros = 1704067200000000L

  /** Generate a consistent random workload: ops over a small key space,
    * maintaining per-key state so before/after images are coherent.
    */
  private def genWorkload(nEvents: Int, seed: Long): Seq[Event] = {
    val rnd = new scala.util.Random(seed)
    val keys = (1 to 8).map(i => s"k$i")
    var state = Map.empty[String, Image]
    var lsn = 0L
    val out = Seq.newBuilder[Event]
    (1 to nEvents).foreach { _ =>
      lsn += 1
      val key = keys(rnd.nextInt(keys.size))
      val existing = state.get(key)
      def fresh(status: String) = Image(lsn, key, status, 0,
        rnd.nextBoolean(), baseMicros + lsn, baseMicros + lsn)
      existing match {
        case None =>
          val img = fresh(s"S${rnd.nextInt(4)}")
          state += key -> img
          out += Event(null, img, Source(lsn.toString, lsn), "c", lsn)
        case Some(prev) if rnd.nextInt(4) == 0 =>
          state -= key
          out += Event(prev, null, Source(lsn.toString, lsn), "d", lsn)
        case Some(prev) =>
          val img = prev.copy(status = s"S${rnd.nextInt(4)}",
            modified_at = baseMicros + lsn)
          state += key -> img
          out += Event(prev, img, Source(lsn.toString, lsn), "u", lsn)
      }
    }
    out.result()
  }

  test("finalView == sequential fold, under shuffle and duplication") {
    for (seed <- 1L to 8L) {
      val n = 10 + (seed * 13 % 50).toInt
      val events = genWorkload(n, seed)
      val rnd = new scala.util.Random(seed)
      // at-least-once + reorder: duplicate a random slice, then shuffle
      val slice = if (events.isEmpty) events
        else events.drop(rnd.nextInt(events.size))
      val delivered = rnd.shuffle(events ++ slice)

      val fv = VersionedUpsert.finalView(
        MvTransform(WorkloadFixture.toDf(spark, delivered)))
      val got = fv.select("booking_id", "status")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap

      val truth = WorkloadFixture.foldToState(events)
        .map { case (k, img) => k -> img.status }
      assert(got === truth, s"seed=$seed n=$n")
    }
  }
}
