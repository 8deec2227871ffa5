package graft

import graft.operators.{IvfTwoLevel, Similarity}
import org.apache.spark.sql.functions._

/** Two-level IVF invariants. The flat-IVF oracle rows certify the
  * shared assignment/tie semantics; this suite pins what makes the
  * two-level path cap-free and correct: the level-2 argmin holds
  * against the trained sub-centroid table, coarse cells genuinely
  * split, every stage is an equi-join (no cartesian, no broadcast of
  * the sub-centroid table), and search candidates come from the
  * query's own (cell, sub) bucket.
  */
class IvfTwoLevelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every vector is indexed; coarse cells match the flat assignment and split") {
    val (index, subCents) = IvfTwoLevel.buildIndexWithCents(spark, dir)
    val n = Tables(spark, dir, "embeddings").count()
    assert(index.count() === n)
    // level 1 is EXACTLY the certified flat assignment
    val flat = Similarity.ivfAssignments(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    index.select("vec_id", "cell").collect().foreach { r =>
      assert(flat(r.getLong(0)) === r.getLong(1))
    }
    // level 2 genuinely splits: more (cell, sub) buckets than cells
    val cells = index.select("cell").distinct().count()
    val buckets = index.select("cell", "sub").distinct().count()
    assert(buckets > cells, s"expected sub-splitting: $buckets buckets over $cells cells")
    // sub-centroids only exist for cells that exist
    assert(subCents.join(index.select("cell").distinct(), Seq("cell"), "left_anti").isEmpty)
  }

  test("level-2 assignment is the argmin over the vector's own cell's sub-centroids") {
    val (index, subCents) = IvfTwoLevel.buildIndexWithCents(spark, dir)
    val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.functions.DotProductD(a, b)
    val cents = subCents
      .withColumn("s_nrm", sqrt(dot(col("s_emb"), col("s_emb"))))
    // recompute best sub per vector with the same rounding/tie rule
    val best = index.join(cents, "cell")
      .withColumn("s_cos",
        round(dot(col("embedding"), col("s_emb")) / (col("nrm") * col("s_nrm")), 4))
      .groupBy(col("vec_id"))
      .agg(max_by(col("s_id"), struct(col("s_cos"), -col("s_id"))).as("best_sub"))
    val diverged = index.join(best, "vec_id")
      .filter(col("sub") =!= col("best_sub"))
    assert(diverged.isEmpty, "stored sub must be the in-cell argmin")
  }

  test("plans are equi-joins end to end — no cartesian, no sub-centroid broadcast") {
    val (index, _) = IvfTwoLevel.buildIndexWithCents(spark, dir)
    // the checkpointed index hides the build; assert on the search plan
    val plan = IvfTwoLevel.search(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"two-level search must stay equi-join shaped:\n$plan")
    assert(index.columns.contains("sub"))
  }

  test("search candidates share the query's (cell, sub) bucket and rank by cosine") {
    val (index, _) = IvfTwoLevel.buildIndexWithCents(spark, dir)
    val buckets = index.select("vec_id", "cell", "sub").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val out = IvfTwoLevel.search(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (q, v) = (r.getLong(0), r.getLong(2))
      assert(buckets(q) === buckets(v), s"candidate $v outside query $q's bucket")
    }
    // per query, ranks are 1..k in descending cosine order
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length))
      val cosines = sorted.map(_.getDouble(3)).toSeq
      assert(cosines === cosines.sorted.reverse)
    }
  }
}
