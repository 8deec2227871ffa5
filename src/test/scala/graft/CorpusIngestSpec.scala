package graft

import graft.sources.CorpusIngest
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL corpus landing: declared schema, clean/dead-letter split, no
  * silent drops — every input line is accounted for exactly once.
  */
class CorpusIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("text", StringType)))

  test("clean rows parse typed; corrupt lines quarantine; nothing is lost") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest")
    val lines = Seq(
      """{"doc_id": 1, "lang": "en", "text": "hello world"}""",
      """{"doc_id": 2, "lang": "de", "text": "hallo welt"}""",
      """not json at all""",
      """{"doc_id": "NaN-ish", "lang": 3}""", // type mismatch → corrupt
      """{"doc_id": 3, "lang": "fr", "text": "bonjour"}""")
    java.nio.file.Files.write(dir.resolve("part-0.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))

    val ingested = CorpusIngest.readJsonl(spark, dir.toString, schema)
    val clean = CorpusIngest.clean(ingested).collect()
    val dead = CorpusIngest.deadLetter(ingested).collect()

    assert(clean.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    assert(clean.head.schema.fieldNames.toSeq === Seq("doc_id", "lang", "text"))
    assert(dead.length === 2)
    assert(dead.map(_.getString(0)).exists(_.contains("not json")))
    // conservation: every input line lands exactly once
    assert(clean.length + dead.length === lines.length)
  }

  test("streaming landing: drops become micro-batches, totals revise, corrupt quarantined") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest-stream")
    val dlDir = java.nio.file.Files.createTempDirectory("graft-ingest-dl").toString
    def drop(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        String.join("\n", lines: _*).getBytes("UTF-8"))

    drop("drop-0.jsonl", Seq(
      """{"doc_id": 1, "lang": "en", "text": "one two three"}""",
      """{"doc_id": 2, "lang": "de", "text": "eins zwei"}"""))

    val stream = CorpusIngest.streamJsonl(spark, dir.toString, schema)
    val totals = CorpusIngest.runningLangTotals(CorpusIngest.clean(stream))
      .writeStream.outputMode("complete").format("memory")
      .queryName("lang_totals").start()
    // dead-letter rides a second checkpointed sink off the same landing
    val dl = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        CorpusIngest.deadLetter(batch)
          .write.mode("append").parquet(dlDir)
      }.start()
    try {
      totals.processAllAvailable(); dl.processAllAvailable()
      val t1 = spark.table("lang_totals").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(t1 === Set(("en", 1L, 3L), ("de", 1L, 2L)))

      // second crawler drop: one more en doc + a corrupt line
      drop("drop-1.jsonl", Seq(
        """{"doc_id": 3, "lang": "en", "text": "four five six seven"}""",
        """broken { line"""))
      totals.processAllAvailable(); dl.processAllAvailable()
      val t2 = spark.table("lang_totals").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(t2 === Set(("en", 2L, 7L), ("de", 1L, 2L)))
      val dead = spark.read.parquet(dlDir).collect().map(_.getString(0))
      assert(dead.length === 1 && dead.head.contains("broken"))
    } finally { totals.stop(); dl.stop() }
  }

  test("streaming first-occurrence dedup: later copies suppressed across batches") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ingest_ts", "text")
    val q = CorpusIngest.streamingFirstOccurrence(docs)
      .writeStream.outputMode("append").format("memory")
      .queryName("first_occ").start()
    def at(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    try {
      in.addData((1L, at(0), "alpha text"), (2L, at(1), "beta text"))
      q.processAllAvailable()
      // batch 2: exact copy of doc 1 under a new id + a fresh doc;
      // the copy must be suppressed by state carried across batches
      in.addData((3L, at(2), "alpha text"), (4L, at(3), "gamma text"))
      q.processAllAvailable()
      val emitted = spark.table("first_occ").collect()
        .map(r => r.getLong(0)).toSet
      assert(emitted === Set(1L, 2L, 4L), "doc 3 is a suppressed duplicate")
    } finally q.stop()
  }

  test("exact-mode dedup (no watermark) deduplicates regardless of arrival time") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ingest_ts", "text")
    val q = CorpusIngest.streamingFirstOccurrence(docs, lateness = None)
      .writeStream.outputMode("append").format("memory")
      .queryName("first_occ_exact").start()
    def at(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
    try {
      in.addData((1L, at(1000), "alpha text"))
      q.processAllAvailable()
      // a copy arriving with a FAR older event time still deduplicates
      // (no watermark horizon to fall behind)
      in.addData((2L, at(0), "alpha text"), (3L, at(2), "delta text"))
      q.processAllAvailable()
      val emitted = spark.table("first_occ_exact").collect()
        .map(r => r.getLong(0)).toSet
      assert(emitted === Set(1L, 3L))
    } finally q.stop()
  }
}
