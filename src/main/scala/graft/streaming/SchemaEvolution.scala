package graft.streaming

import graft.operators.MvTransform
import graft.schema.ChangeEvent
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** T7 ADDITIVE SCHEMA EVOLUTION: apply mid-stream `ALTER TABLE … ADD
  * COLUMN` instead of quarantining it.
  *
  * The reference forwards DDL events into the stream
  * (`include.schema.changes=true`,
  * `/root/reference/connectors/debezium_configuration.json:27`); its
  * ClickHouse landing tables are declared once, so a new source column
  * silently vanishes until an operator alters the sink. This engine
  * does better: the wire is schemaless JSON
  * (`schemas.enable=false`), so the only schema that matters is the
  * one handed to `from_json` — a DDL envelope arriving mid-stream
  * widens that parse schema for every later micro-batch, the MV
  * transform projects the new image fields through to the upsert log,
  * parquet appends the wider rows, and a FINAL read under
  * `mergeSchema` surfaces the column with pre-DDL rows null-backfilled.
  *
  * Safe CDC subset ONLY: ADD COLUMN widens, and COLUMN RENAME (the
  * next most common Debezium DDL event) applies via a journaled ALIAS
  * MAP — the log is never rewritten; post-rename rows land under the
  * new name and [[readEvolvedLog]] unifies history with
  * `coalesce(new, old)` so pre-rename rows backfill under the new
  * name. Drops/type changes still dead-letter (they cannot be applied
  * without rewriting history), as do renames of the BASE envelope
  * columns (the compiled MV projection owns those names) and renames
  * whose source column is unknown. Applied DDL is journaled to a
  * tiny `_schema` directory so a restarted stream re-parses with the
  * evolved schema, not the compiled-in base — the schema journal is
  * control-plane state exactly like the checkpoint.
  *
  * Ordering: Debezium emits the DDL event before any data event that
  * uses the new column, and micro-batches preserve file order, so
  * folding the batch's DDL into the schema BEFORE parsing the batch's
  * data rows never drops a value.
  */
object SchemaEvolution {

  /** One additive column change. */
  case class ColumnAdd(table: String, column: String, dataType: DataType)

  /** One column rename — an alias-map entry, never a history rewrite. */
  case class ColumnRename(table: String, from: String, to: String)

  /** PostgreSQL type name → the Spark type Debezium's JSON wire carries
    * for it. Timestamps are epoch-µs Int64 on the wire
    * (`/root/reference/schemas/clickhouse_schemas.sql:22-23`) — they
    * stay Long here; converting is the MV transform's business for
    * columns it knows, and downstream's for evolved ones.
    */
  def pgWireType(t: String): DataType = {
    val n = t.trim.toLowerCase.replaceAll("\\s+", " ")
    if (n.startsWith("varchar") || n.startsWith("character varying") ||
      n == "text" || n == "char" || n.startsWith("character")) StringType
    else if (n == "smallint" || n == "int2") ShortType
    else if (n == "int" || n == "integer" || n == "int4" || n == "serial")
      IntegerType
    else if (n == "bigint" || n == "int8" || n == "bigserial") LongType
    else if (n == "boolean" || n == "bool") BooleanType
    else if (n == "real" || n == "float4") FloatType
    else if (n == "double precision" || n == "float8") DoubleType
    else if (n.startsWith("timestamp")) LongType // epoch-µs wire form
    else if (n.startsWith("numeric") || n.startsWith("decimal")) StringType
    else StringType // unmodeled types land as their JSON string form
  }

  private val addColumnRe =
    """(?is)ALTER\s+TABLE\s+(?:ONLY\s+)?([\w.]+)\s+(.*)""".r
  private val addClauseRe =
    """(?is)\s*ADD\s+(?:COLUMN\s+)?(?:IF\s+NOT\s+EXISTS\s+)?"?([A-Za-z_][A-Za-z0-9_]*)"?\s+([A-Za-z][A-Za-z0-9 ]*(?:\(\d+(?:,\s*\d+)?\))?).*""".r

  /** Extract the additive column changes from one DDL statement.
    * Non-ADD clauses (DROP/RENAME/ALTER TYPE) yield nothing — callers
    * dead-letter the envelope instead.
    */
  def parseAdds(ddl: String): Seq[ColumnAdd] = ddl match {
    case addColumnRe(table, clauses) =>
      clauses.split(",").toIndexedSeq.flatMap {
        case addClauseRe(col, typ) =>
          Some(ColumnAdd(table.toLowerCase, col.toLowerCase,
            pgWireType(typ.trim)))
        case _ => None
      }
    case _ => Nil
  }

  private val renameRe =
    """(?is)ALTER\s+TABLE\s+(?:ONLY\s+)?([\w.]+)\s+RENAME\s+(?:COLUMN\s+)?"?([A-Za-z_][A-Za-z0-9_]*)"?\s+TO\s+"?([A-Za-z_][A-Za-z0-9_]*)"?\s*""".r

  /** Extract a column rename from one DDL statement. Table renames
    * (`RENAME TO x` — no column between RENAME and TO) and other
    * RENAME forms don't match and so dead-letter.
    */
  def parseRenames(ddl: String): Seq[ColumnRename] = ddl match {
    case renameRe(table, from, to) =>
      Seq(ColumnRename(table.toLowerCase, from.toLowerCase, to.toLowerCase))
    case _ => Nil
  }

  /** Widen both images with each rename's TARGET column, carrying the
    * SOURCE column's type (the wire starts emitting the new name after
    * the DDL; the old field stays so pre-rename rows in the same batch
    * and restart replays still parse). Applied in journal order so
    * rename chains (a→b, later b→c) resolve.
    */
  def evolveRenames(base: StructType,
                    renames: Seq[ColumnRename]): StructType = {
    def widen(img: StructType): StructType =
      renames.foldLeft(img) { (s, r) =>
        s.fields.find(_.name == r.from) match {
          case Some(f) if !s.fieldNames.contains(r.to) =>
            s.add(StructField(r.to, f.dataType))
          case _ => s
        }
      }
    StructType(base.fields.map {
      case StructField(n @ ("before" | "after"), img: StructType, nl, m) =>
        StructField(n, widen(img), nl, m)
      case f => f
    })
  }

  /** Widen both row images with the adds (append-only; an add whose
    * name already exists is ignored — re-delivered DDL must be
    * idempotent under at-least-once).
    */
  def evolveEnvelope(base: StructType, adds: Seq[ColumnAdd]): StructType = {
    def widen(img: StructType): StructType =
      adds.foldLeft(img) { (s, a) =>
        if (s.fieldNames.contains(a.column)) s
        else s.add(StructField(a.column, a.dataType))
      }
    StructType(base.fields.map {
      case StructField(n @ ("before" | "after"), img: StructType, nl, m) =>
        StructField(n, widen(img), nl, m)
      case f => f
    })
  }

  /** The evolved MV transform: the base Booking projection plus a
    * delete-aware `pick` of every after-image field beyond the base
    * envelope — new columns flow to the upsert log as their wire type.
    */
  def applyEvolved(changes: DataFrame): DataFrame = {
    val baseFields = ChangeEvent.envelopeSchema("after")
      .dataType.asInstanceOf[StructType].fieldNames.toSet
    val afterFields = changes.schema("after")
      .dataType.asInstanceOf[StructType].fieldNames.toSeq
    val isDelete = col("op") === "d"
    def pick(field: String): Column =
      when(isDelete, col(s"before.$field")).otherwise(col(s"after.$field"))
    val extras = afterFields.filterNot(baseFields)
      .map(f => pick(f).as(f))
    val base = Seq(
      pick("booking_id").as("booking_id"),
      pick("status").as("status"),
      when(isDelete, lit(1)).otherwise(lit(0)).as("is_deleted"),
      pick("is_canceled").as("is_canceled"),
      timestamp_micros(pick("created_at")).as("created_at"),
      timestamp_micros(pick("modified_at")).as("modified_at"),
      col("source.lsn").as("version"))
    changes.filter(col("op").isin(MvTransform.dataOps: _*))
      .select(base ++ extras: _*)
  }

  // ---- schema journal (control-plane state, like the checkpoint) ----

  private def journalFile(schemaDir: String) =
    new java.io.File(schemaDir, "adds.tsv")

  /** Load journaled adds (empty on first start). */
  def loadJournal(schemaDir: String): Seq[ColumnAdd] = {
    val f = journalFile(schemaDir)
    if (!f.exists()) Nil
    else scala.io.Source.fromFile(f, "UTF-8").getLines().filter(_.nonEmpty)
      .map { l =>
        val Array(t, c, dt) = l.split("\t")
        ColumnAdd(t, c, DataType.fromDDL(dt))
      }.toSeq
  }

  private def appendJournal(schemaDir: String, adds: Seq[ColumnAdd]): Unit =
    if (adds.nonEmpty) {
      val f = journalFile(schemaDir)
      f.getParentFile.mkdirs()
      val w = new java.io.FileWriter(f, true)
      try adds.foreach(a =>
        w.write(s"${a.table}\t${a.column}\t${a.dataType.sql}\n"))
      finally w.close()
    }

  private def renameJournalFile(schemaDir: String) =
    new java.io.File(schemaDir, "renames.tsv")

  /** Load the journaled alias map (empty on first start), in applied
    * order — order matters for rename chains.
    */
  def loadRenameJournal(schemaDir: String): Seq[ColumnRename] = {
    val f = renameJournalFile(schemaDir)
    if (!f.exists()) Nil
    else scala.io.Source.fromFile(f, "UTF-8").getLines().filter(_.nonEmpty)
      .map { l =>
        val Array(t, from, to) = l.split("\t")
        ColumnRename(t, from, to)
      }.toSeq
  }

  private def appendRenameJournal(schemaDir: String,
                                  renames: Seq[ColumnRename]): Unit =
    if (renames.nonEmpty) {
      val f = renameJournalFile(schemaDir)
      f.getParentFile.mkdirs()
      val w = new java.io.FileWriter(f, true)
      try renames.foreach(r => w.write(s"${r.table}\t${r.from}\t${r.to}\n"))
      finally w.close()
    }

  /** Start the evolving pipeline over a RAW JSON-lines change
    * directory (the schemaless wire form). Per micro-batch:
    *  1. envelopes carrying a `ddl` field are schema-change events —
    *     their additive clauses widen the parse schema (journaled to
    *     `schemaDir`); non-additive DDL dead-letters;
    *  2. data envelopes re-parse under the evolved schema and append
    *     to the upsert log (parquet appends tolerate widening);
    *  3. remaining non-data envelopes dead-letter as before (T7's
    *     quarantine half).
    * FINAL reads go through [[readEvolvedLog]].
    */
  def start(
      spark: SparkSession,
      changesDir: String,
      bookingsDir: String,
      checkpointDir: String,
      schemaDir: String,
      deadLetterDir: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // the DDL probe schema: just enough to split control from data
    val probe = StructType(Seq(
      StructField("op", StringType), StructField("ddl", StringType)))
    val baseAfterFields = ChangeEvent.envelopeSchema("after")
      .dataType.asInstanceOf[StructType].fieldNames.toSet
    var adds = loadJournal(schemaDir)
    var renames = loadRenameJournal(schemaDir)
    spark.readStream.text(changesDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          val probed = batch.select(col("value"),
            from_json(col("value"), probe).as("p"))
          // control plane: tiny by construction (one row per DDL)
          val ddls = probed.filter(col("p.ddl").isNotNull)
            .select("p.ddl").collect().map(_.getString(0)).toSeq
          val newAdds = ddls.flatMap(parseAdds)
            .filterNot(a => adds.exists(_.column == a.column))
          appendJournal(schemaDir, newAdds)
          adds = adds ++ newAdds
          // rename applicability, in arrival order against the image
          // as evolved SO FAR: source must resolve and not be a base
          // projection column; target must be fresh. A re-delivered
          // rename is recognized (idempotent), not re-applied.
          var afterCols = baseAfterFields ++ adds.map(_.column) ++
            renames.map(_.to)
          val newRenames = ddls.flatMap(parseRenames).flatMap { r =>
            if (renames.contains(r)) None // at-least-once re-delivery
            else if (!baseAfterFields.contains(r.from) &&
              afterCols.contains(r.from) && !afterCols.contains(r.to)) {
              afterCols += r.to
              Some(r)
            } else None
          }
          appendRenameJournal(schemaDir, newRenames)
          renames = renames ++ newRenames
          val schema = evolveRenames(
            evolveEnvelope(ChangeEvent.envelopeSchema, adds), renames)
          val data = probed.filter(col("p.ddl").isNull)
            .select(from_json(col("value"), schema).as("e")).select("e.*")
          applyEvolved(data).write.mode("append").parquet(bookingsDir)
          deadLetterDir.foreach { dl =>
            // unapplied DDL (drops, type changes, table renames,
            // base-column or unresolvable renames) + heartbeats/unknown
            // ops, raw wire form. A DDL is applied iff it yielded an
            // add or a journaled rename (re-deliveries count).
            val appliedDdl = (ddls.filter(d => parseAdds(d).nonEmpty) ++
              ddls.filter(d => parseRenames(d).exists(renames.contains)))
              .toSet
            val nonApplied =
              if (appliedDdl.isEmpty) probed.filter(col("p.ddl").isNotNull)
              else probed.filter(col("p.ddl").isNotNull &&
                !col("p.ddl").isInCollection(appliedDdl))
            MvTransform.droppedEnvelopes(data)
              .select(to_json(struct(col("*"))).as("value"))
              .unionByName(nonApplied.select("value"))
              .write.mode("append").text(dl)
          }
        } finally batch.unpersist()
      }
      .start()
  }

  /** FINAL read over an evolved log: schema union across files, so
    * rows written before an ADD COLUMN surface the column as null.
    */
  def readEvolvedLog(spark: SparkSession, bookingsDir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(bookingsDir)

  /** FINAL read with the journaled alias map applied: for each rename
    * a→b (journal order, so chains resolve), history rows that carry
    * only `a` BACKFILL under `b` via `coalesce(b, a)` and the old name
    * drops from the surface — the log itself is never rewritten. Reads
    * identically to a log whose history had always used the new name.
    */
  def readEvolvedLog(spark: SparkSession, bookingsDir: String,
                     schemaDir: String): DataFrame =
    loadRenameJournal(schemaDir).foldLeft(
      readEvolvedLog(spark, bookingsDir)) { (d, r) =>
      val cols = d.columns.toSet
      if (cols(r.from) && cols(r.to))
        d.withColumn(r.to, coalesce(col(r.to), col(r.from))).drop(r.from)
      else if (cols(r.from)) d.withColumnRenamed(r.from, r.to)
      else d
    }

  /** Drain all currently-available input synchronously (test helper). */
  def runOnce(
      spark: SparkSession,
      changesDir: String,
      bookingsDir: String,
      checkpointDir: String,
      schemaDir: String,
      deadLetterDir: Option[String] = None): Unit =
    start(spark, changesDir, bookingsDir, checkpointDir, schemaDir,
      deadLetterDir).awaitTermination()
}
