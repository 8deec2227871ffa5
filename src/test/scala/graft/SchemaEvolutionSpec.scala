package graft

import graft.operators.VersionedUpsert
import graft.sources.{ChangeLog, WorkloadFixture}
import graft.streaming.SchemaEvolution
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** T7 additive schema evolution: an `ALTER TABLE … ADD COLUMN` DDL
  * envelope arriving mid-stream widens the parse schema, later data
  * envelopes carry the new column into the upsert log, and FINAL
  * reads surface it with pre-DDL rows null-backfilled. Non-additive
  * DDL still dead-letters, and the applied schema survives a restart
  * via the journal.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("pg wire types map to the Debezium JSON shapes") {
    import SchemaEvolution.pgWireType
    assert(pgWireType("text") === StringType)
    assert(pgWireType("VARCHAR(50)") === StringType)
    assert(pgWireType("integer") === IntegerType)
    assert(pgWireType("bigint") === LongType)
    assert(pgWireType("boolean") === BooleanType)
    assert(pgWireType("double precision") === DoubleType)
    assert(pgWireType("timestamp") === LongType) // epoch-µs wire form
    assert(pgWireType("TIMESTAMP WITHOUT TIME ZONE") === LongType)
  }

  test("parseAdds: additive clauses extracted, non-additive DDL yields none") {
    import SchemaEvolution.{parseAdds, ColumnAdd}
    assert(parseAdds("ALTER TABLE public.bookings ADD COLUMN note text") ===
      Seq(ColumnAdd("public.bookings", "note", StringType)))
    assert(parseAdds(
      "ALTER TABLE bookings ADD COLUMN IF NOT EXISTS \"priority\" integer") ===
      Seq(ColumnAdd("bookings", "priority", IntegerType)))
    assert(parseAdds(
      "alter table t add column a bigint, add column b boolean") ===
      Seq(SchemaEvolution.ColumnAdd("t", "a", LongType),
        SchemaEvolution.ColumnAdd("t", "b", BooleanType)))
    assert(parseAdds("ALTER TABLE t DROP COLUMN note") === Nil)
    assert(parseAdds("ALTER TABLE t RENAME COLUMN a TO b") === Nil)
    assert(parseAdds("CREATE INDEX idx ON t(a)") === Nil)
  }

  test("parseRenames: column renames extracted; table renames and drops yield none") {
    import SchemaEvolution.{parseRenames, ColumnRename}
    assert(parseRenames("ALTER TABLE public.bookings RENAME COLUMN note TO vip_note")
      === Seq(ColumnRename("public.bookings", "note", "vip_note")))
    assert(parseRenames("alter table t rename a to b")
      === Seq(ColumnRename("t", "a", "b")))
    assert(parseRenames("ALTER TABLE t RENAME \"OldName\" TO \"NewName\"")
      === Seq(ColumnRename("t", "oldname", "newname")))
    // table rename: no column between RENAME and TO
    assert(parseRenames("ALTER TABLE bookings RENAME TO bookings_v2") === Nil)
    assert(parseRenames("ALTER TABLE t DROP COLUMN note") === Nil)
    assert(parseRenames("ALTER TABLE t ADD COLUMN note text") === Nil)
  }

  test("evolveRenames widens with the target at the source's type; chains resolve") {
    import graft.schema.ChangeEvent
    val withAdd = SchemaEvolution.evolveEnvelope(ChangeEvent.envelopeSchema,
      Seq(SchemaEvolution.ColumnAdd("t", "note", StringType)))
    val evolved = SchemaEvolution.evolveRenames(withAdd, Seq(
      SchemaEvolution.ColumnRename("t", "note", "vip_note"),
      SchemaEvolution.ColumnRename("t", "vip_note", "final_note")))
    Seq("before", "after").foreach { img =>
      val st = evolved(img).dataType.asInstanceOf[StructType]
      // old names stay (history + same-batch pre-DDL rows still parse)
      assert(st.fieldNames.contains("note"))
      assert(st("vip_note").dataType === StringType)
      assert(st("final_note").dataType === StringType) // chain resolved
    }
  }

  test("evolveEnvelope widens both images, idempotently") {
    import graft.schema.ChangeEvent
    val adds = Seq(
      SchemaEvolution.ColumnAdd("public.bookings", "note", StringType),
      SchemaEvolution.ColumnAdd("public.bookings", "note", StringType))
    val evolved = SchemaEvolution.evolveEnvelope(ChangeEvent.envelopeSchema, adds)
    Seq("before", "after").foreach { img =>
      val st = evolved(img).dataType.asInstanceOf[StructType]
      assert(st.fieldNames.count(_ == "note") === 1)
      assert(st("note").dataType === StringType)
    }
    assert(evolved("source") === ChangeEvent.envelopeSchema("source"))
  }

  test("column appears mid-stream; FINAL surfaces it null-backfilled; restart keeps it") {
    val root = Files.createTempDirectory("graft-evolve").toString
    val changes = s"$root/changes"
    val bookings = s"$root/bookings"
    val schemaDir = s"$root/schema"
    val deadLetter = s"$root/dead_letter"
    Files.createDirectories(Paths.get(changes))

    def writeLines(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(changes, name),
        lines.mkString("\n").getBytes("UTF-8"))

    // wave 1: the README workload in raw JSON wire form (base schema)
    val events = WorkloadFixture.toDf(spark)
    val baseLines = events
      .select(to_json(struct(events.columns.map(col): _*)).as("v"))
      .collect().map(_.getString(0)).toSeq
    writeLines("wave1.txt", baseLines)
    SchemaEvolution.runOnce(spark, changes, bookings, s"$root/ckpt",
      schemaDir, Some(deadLetter))

    val before = SchemaEvolution.readEvolvedLog(spark, bookings)
    assert(!before.columns.contains("note"))
    assert(VersionedUpsert.finalView(before).count() === 6L)

    // wave 2: the ADD COLUMN DDL followed by an update that uses it,
    // plus a non-additive DDL that must dead-letter
    def img(id: Int, bid: String, status: String, note: String) =
      s"""{"id":$id,"booking_id":"$bid","status":"$status","is_deleted":0,""" +
        s""""is_canceled":false,"created_at":1704067200000000,""" +
        s""""modified_at":1704067200000000,"note":"$note"}"""
    writeLines("wave2.txt", Seq(
      """{"ddl":"ALTER TABLE public.bookings ADD COLUMN note text","ts_ms":1704070000000}""",
      """{"ddl":"ALTER TABLE public.bookings DROP COLUMN status","ts_ms":1704070000001}""",
      s"""{"before":null,"after":${img(1, "b1", "Open", "vip")},""" +
        s""""source":{"sequence":"[\\"0\\",\\"20001\\"]","lsn":20001},"op":"u","ts_ms":1704070001000}"""))
    SchemaEvolution.runOnce(spark, changes, bookings, s"$root/ckpt",
      schemaDir, Some(deadLetter))

    val evolved = SchemaEvolution.readEvolvedLog(spark, bookings)
    assert(evolved.columns.contains("note"))
    val fv = VersionedUpsert.finalView(evolved)
      .select("booking_id", "note").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(fv.keySet === WorkloadFixture.goldenKeys.toSet)
    assert(fv("b1") === Some("vip"))
    // every pre-DDL row surfaces the new column null-backfilled
    assert(WorkloadFixture.goldenKeys.filterNot(_ == "b1")
      .forall(k => fv(k).isEmpty))

    // the non-additive DDL landed in the dead letter, raw wire form
    val dropped = spark.read.text(deadLetter)
    assert(dropped.filter(col("value").contains("DROP COLUMN")).count() === 1L)

    // wave 3: a RESTARTED pipeline (fresh runner, same journal) still
    // parses the evolved column without re-seeing the DDL
    writeLines("wave3.txt", Seq(
      s"""{"before":null,"after":${img(2, "b2", "Created", "gold")},""" +
        s""""source":{"sequence":"[\\"0\\",\\"20002\\"]","lsn":20002},"op":"u","ts_ms":1704070002000}"""))
    SchemaEvolution.runOnce(spark, changes, bookings, s"$root/ckpt",
      schemaDir, Some(deadLetter))
    val fv3 = VersionedUpsert.finalView(
        SchemaEvolution.readEvolvedLog(spark, bookings))
      .select("booking_id", "note").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(fv3("b2") === Some("gold"))
    assert(fv3("b1") === Some("vip"))

    // ---- wave 4: COLUMN RENAME mid-stream (note -> vip_note) ----
    def imgRenamed(id: Int, bid: String, status: String, note: String) =
      s"""{"id":$id,"booking_id":"$bid","status":"$status","is_deleted":0,""" +
        s""""is_canceled":false,"created_at":1704067200000000,""" +
        s""""modified_at":1704067200000000,"vip_note":"$note"}"""
    writeLines("wave4.txt", Seq(
      """{"ddl":"ALTER TABLE public.bookings RENAME COLUMN note TO vip_note","ts_ms":1704070003000}""",
      // base-column rename and a TABLE rename must both dead-letter
      """{"ddl":"ALTER TABLE public.bookings RENAME COLUMN status TO state","ts_ms":1704070003001}""",
      """{"ddl":"ALTER TABLE public.bookings RENAME TO bookings_v2","ts_ms":1704070003002}""",
      s"""{"before":null,"after":${imgRenamed(3, "b3", "Open", "silver")},""" +
        s""""source":{"sequence":"[\\"0\\",\\"20003\\"]","lsn":20003},"op":"u","ts_ms":1704070004000}"""))
    SchemaEvolution.runOnce(spark, changes, bookings, s"$root/ckpt",
      schemaDir, Some(deadLetter))

    val aliased = SchemaEvolution.readEvolvedLog(spark, bookings, schemaDir)
    // the alias map unifies history under the NEW name and retires the old
    assert(aliased.columns.contains("vip_note"))
    assert(!aliased.columns.contains("note"))
    val fv4 = VersionedUpsert.finalView(aliased)
      .select("booking_id", "vip_note").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(fv4("b3") === Some("silver")) // post-rename row, new name
    assert(fv4("b1") === Some("vip")) // pre-rename history BACKFILLED
    assert(fv4("b2") === Some("gold"))
    // unapplied renames dead-lettered in raw wire form; applied one not
    val dl4 = spark.read.text(deadLetter)
    assert(dl4.filter(col("value").contains("status TO state")).count() === 1L)
    assert(dl4.filter(col("value").contains("RENAME TO bookings_v2")).count() === 1L)
    assert(dl4.filter(col("value").contains("note TO vip_note")).count() === 0L)

    // ---- wave 5: restart keeps the alias without re-seeing the DDL ----
    writeLines("wave5.txt", Seq(
      s"""{"before":null,"after":${imgRenamed(4, "b4", "Created", "bronze")},""" +
        s""""source":{"sequence":"[\\"0\\",\\"20004\\"]","lsn":20004},"op":"u","ts_ms":1704070005000}"""))
    SchemaEvolution.runOnce(spark, changes, bookings, s"$root/ckpt",
      schemaDir, Some(deadLetter))
    val fv5 = VersionedUpsert.finalView(
        SchemaEvolution.readEvolvedLog(spark, bookings, schemaDir))
      .select("booking_id", "vip_note").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(fv5("b4") === Some("bronze"))
    assert(fv5("b1") === Some("vip"))
  }
}
