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
}
