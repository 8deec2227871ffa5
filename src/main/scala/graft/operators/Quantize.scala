package graft.operators

import graft.Tables
import graft.functions.DotProductD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization for storage/serving — the standard 4×
  * compression an embedding store applies before ANN serving (floats
  * ride training; int8 + one scale per vector ride the index). The
  * audit emits, per vector, the symmetric quantization scale, integer
  * checksums of the code vector, and the exact reconstruction error —
  * the quality gate a pipeline checks before switching its serving
  * index to quantized codes.
  *
  * Cross-engine exactness: `maxabs` is a max over exactly-widened
  * floats; codes are `trunc(x·127/maxabs)` (both engines truncate
  * toward zero — Spark's double→long cast, DuckDB's `trunc`), so
  * scale and all integer outputs are bit-exact. The reconstruction
  * error uses the algebraic form ⟨x,x⟩ − 2c⟨x,q⟩ + c²⟨q,q⟩ with
  * c = maxabs/127 over [[DotProductD]] folds and is rounded to 6 —
  * double-sum reorder noise is ~1e-14 absolute, nine orders below the
  * rounding quantum (the cosSql precedent).
  *
  * Scale shape (100 TB): one narrow map pass over the embedding
  * column — per-row HOFs and three codegen'd dot products, no
  * shuffle but the presentation sort. The all-zero-vector edge
  * (maxabs = 0) quantizes to zeros with zero error rather than NaN.
  */
object Quantize {

  def int8Audit(spark: SparkSession, dir: String): DataFrame =
    int8AuditOf(Tables(spark, dir, "embeddings")).orderBy("vec_id")

  /** The audit over any (vec_id, embedding) frame — batch table or
    * arriving stream batch: a stateless narrow projection (no sort —
    * append-mode streamable; the batch entry adds the presentation
    * order).
    */
  def int8AuditOf(vecs: DataFrame): DataFrame = {
    val base = vecs
      .select(col("vec_id"),
        transform(col("embedding"), v => v.cast("double")).as("x"))
      .withColumn("maxabs", array_max(transform(col("x"), v => abs(v))))
      .withColumn("q",
        when(col("maxabs") === 0d, transform(col("x"), _ => lit(0L)))
          .otherwise(transform(col("x"),
            v => (v * lit(127.0d) / col("maxabs")).cast("long"))))
      .withColumn("qd", transform(col("q"), v => v.cast("double")))
    val c = col("maxabs") / lit(127.0d)
    base.select(col("vec_id"), col("maxabs"),
      aggregate(col("q"), lit(0L), (acc, v) => acc + v).as("sum_q"),
      array_min(col("q")).as("min_q"),
      array_max(col("q")).as("max_q"),
      round(
        DotProductD(col("x"), col("x")) -
          lit(2.0d) * c * DotProductD(col("x"), col("qd")) +
          c * c * DotProductD(col("qd"), col("qd")), 6).as("recon_err"))
  }
}
