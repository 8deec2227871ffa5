package graft.sources

import graft.schema.ChangeEvent._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Deterministic replay of the reference's documented workload
  * (`/root/reference/README.md:142-152,288-305`) as a change-event
  * fixture — the engine's golden end-to-end input (FIXTURES.md §A.4):
  *
  *  1. snapshot read (op='r') of b1..b10;
  *  2. 3 inserts (op='c') b11..b13, status New;
  *  3. update Delayed|New → In Progress (`README.md:296`);
  *  4. update In Progress → Closed (`README.md:300`);
  *  5. delete Closed (`README.md:305`).
  *
  * Expected final state: exactly 6 rows — b1 Open, b2 Created,
  * b7 Completed, b8 Cancelled, b9 Cancelled, b10 Completed
  * (`README.md:309-329` parity check).
  *
  * LSN = event sequence number (monotone, as a real WAL LSN is);
  * timestamps derive from LSN so the fixture is fully deterministic.
  */
object WorkloadFixture {

  /** 2024-01-01T00:00:00Z in epoch µs. */
  private val baseMicros = 1704067200000000L

  /** The simulated-PG truth: fold events into a key→row map (what
    * `SELECT * FROM bookings` on the OLTP side would return).
    */
  def foldToState(events: Seq[Event]): Map[String, Image] =
    events.sortBy(_.source.lsn).foldLeft(Map.empty[String, Image]) { (m, e) =>
      e.op match {
        case "d" => m - e.before.booking_id
        case _   => m + (e.after.booking_id -> e.after)
      }
    }

  /** The full workload as ordered change events. */
  lazy val events: Seq[Event] = {
    val initial = Seq(
      "b1" -> "Open", "b2" -> "Created", "b3" -> "In Progress",
      "b4" -> "In Progress", "b5" -> "Delayed", "b6" -> "Delayed",
      "b7" -> "Completed", "b8" -> "Cancelled", "b9" -> "Cancelled",
      "b10" -> "Completed")
    val canceled = Set("b8", "b9")

    var lsn = 0L
    var state = Map.empty[String, Image]
    val out = Seq.newBuilder[Event]

    def img(id: Long, bid: String, status: String, isCanceled: Boolean,
        createdLsn: Long): Image =
      Image(id, bid, status, 0, isCanceled,
        baseMicros + createdLsn * 1000000L, baseMicros + lsn * 1000000L)

    def emit(op: String, before: Image, after: Image): Unit = {
      out += Event(before, after, Source(s"[\"0\",\"$lsn\"]", lsn), op,
        baseMicros / 1000L + lsn * 1000L)
      if (op == "d") state -= before.booking_id
      else state += (after.booking_id -> after)
    }

    // 1. snapshot read of the initial 10 rows (README.md:142-152)
    initial.zipWithIndex.foreach { case ((bid, status), i) =>
      lsn += 1
      emit("r", null, img(i + 1L, bid, status, canceled(bid), lsn))
    }
    // 2. inserts b11..b13 (README.md:288-292)
    Seq("b11", "b12", "b13").zipWithIndex.foreach { case (bid, i) =>
      lsn += 1
      emit("c", null, img(11L + i, bid, "New", isCanceled = false, lsn))
    }
    // 3. UPDATE … SET status='In Progress' WHERE status IN ('Delayed','New')
    //    (README.md:296) — full before image: REPLICA IDENTITY FULL
    def update(pred: Image => Boolean, newStatus: String): Unit =
      state.values.toSeq.sortBy(_.id.longValue).filter(pred).foreach { prev =>
        lsn += 1
        emit("u", prev, prev.copy(status = newStatus,
          modified_at = baseMicros + lsn * 1000000L))
      }
    update(r => r.status == "Delayed" || r.status == "New", "In Progress")
    // 4. UPDATE … SET status='Closed' WHERE status='In Progress' (README.md:300)
    update(_.status == "In Progress", "Closed")
    // 5. DELETE WHERE status='Closed' (README.md:305)
    state.values.toSeq.sortBy(_.id.longValue).filter(_.status == "Closed")
      .foreach { prev =>
        lsn += 1
        emit("d", prev, null)
      }
    out.result()
  }

  /** Expected `finalView` keys after the workload. */
  val goldenKeys: Seq[String] = Seq("b1", "b10", "b2", "b7", "b8", "b9")

  def toDf(spark: SparkSession, evts: Seq[Event] = events): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Event] = spark.createDataset(evts)
    ds.toDF()
  }
}
