package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Split determinism: the assignment is a pure function of content —
  * invariant under repartitioning and re-evaluation — and roughly
  * matches the 90/5/5 target.
  */
class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("split assignment is stable under repartitioning") {
    val docs = Tables(spark, dir, "documents")
    val base = docs.withColumn("split", Sampling.splitAssign(col("text")))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val reparted = docs.repartition(13)
      .withColumn("split", Sampling.splitAssign(col("text")))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(base === reparted)
  }

  test("split proportions are near 90/5/5 and exhaustive") {
    val counts = Tables(spark, dir, "documents")
      .withColumn("split", Sampling.splitAssign(col("text")))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts("train").toDouble / total > 0.8)
    assert(counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L) > 0)
  }

  test("exact dedup by content hash equals dedup by raw text") {
    val docs = Tables(spark, dir, "documents")
    val byHash = graft.operators.Dedup.exact(spark, dir).count()
    val byText = docs.groupBy(lower(trim(col("text")))).count().count()
    assert(byHash === byText) // md5 grouping introduced no collisions
  }
}
