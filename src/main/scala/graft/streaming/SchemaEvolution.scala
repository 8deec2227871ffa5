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
  * Additive ONLY, matching the safe CDC subset: ADD COLUMN widens;
  * drops/renames/type changes still dead-letter (they cannot be
  * applied without rewriting history). Applied DDL is journaled to a
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
    var adds = loadJournal(schemaDir)
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
          val schema = evolveEnvelope(ChangeEvent.envelopeSchema, adds)
          val data = probed.filter(col("p.ddl").isNull)
            .select(from_json(col("value"), schema).as("e")).select("e.*")
          applyEvolved(data).write.mode("append").parquet(bookingsDir)
          deadLetterDir.foreach { dl =>
            // non-additive DDL + heartbeats/unknown ops, raw wire form
            val nonAdditive = probed.filter(col("p.ddl").isNotNull &&
              !col("p.ddl").rlike("(?is)\\bADD\\b"))
            MvTransform.droppedEnvelopes(data)
              .select(to_json(struct(col("*"))).as("value"))
              .unionByName(nonAdditive.select("value"))
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
