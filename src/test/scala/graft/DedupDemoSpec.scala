package graft

import graft.examples.DedupDemo
import graft.operators.Dedup
import graft.sources.CorpusIngest
import org.apache.spark.sql.functions._

/** The DedupDemo pipeline stages against its deterministic fixture:
  * ingest quarantines exactly the corrupt line, LSH+clusters collapse
  * the near-dup group, and the survivor set is exact.
  */
class DedupDemoSpec extends SparkSpec {

  test("demo fixture: 1 dead-letter, near-dup cluster collapses, uniques kept") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("dedup-demo-spec").toString
    DedupDemo.fixtureLines.toDF("value").coalesce(1)
      .write.mode("overwrite").text(s"$root/raw")

    val ingested = CorpusIngest.readJsonl(spark, s"$root/raw", DedupDemo.corpusSchema)
    assert(ingested.count() === 7)
    assert(CorpusIngest.deadLetter(ingested).count() === 1)
    val clean = CorpusIngest.clean(ingested)
    assert(clean.count() === 6)

    val tableDir = s"$root/tables"
    clean.withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tableDir/documents.parquet")

    // docs 0-3 are one near-dup group (small edits / exact dup of the
    // base text); 4 and 5 are unique. The survivor of the group is the
    // highest-quality member, ties to smallest id → 0.
    val pairDocs = Dedup.lshCandidatePairs(spark, tableDir).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(pairDocs === Set(0L, 1L, 2L, 3L))
    val survivors = Dedup.survivors(spark, tableDir).collect()
      .map(_.getLong(0)).toSet
    assert(survivors === Set(0L, 4L, 5L))
  }
}
