package graft.operators

import graft.Tables
import graft.functions.{DotProductD, Int8QuantStats}
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
  * toward zero), so scale and all integer outputs are bit-exact. The
  * reconstruction error is the algebraic form ⟨x,x⟩ − 2c⟨x,q⟩ +
  * c²⟨q,q⟩ with c = maxabs/127 over index-order double folds, rounded
  * to 6 — double-sum reorder noise is ~1e-14 absolute, nine orders
  * below the rounding quantum (the cosSql precedent).
  *
  * Scale shape (100 TB): one narrow map pass — the fused native
  * [[Int8QuantStats]] kernel inside whole-stage codegen, no shuffle
  * but the presentation sort. The all-zero-vector edge (maxabs = 0)
  * quantizes to zeros with zero error rather than NaN.
  */
object Quantize {

  def int8Audit(spark: SparkSession, dir: String): DataFrame =
    int8AuditOf(Tables(spark, dir, "embeddings")).orderBy("vec_id")

  /** The audit over any (vec_id, embedding) frame — batch table or
    * arriving stream batch: a stateless narrow projection (no sort —
    * append-mode streamable; the batch entry adds the presentation
    * order). One [[Int8QuantStats]] kernel call per row.
    */
  def int8AuditOf(vecs: DataFrame): DataFrame =
    vecs
      .select(col("vec_id"), Int8QuantStats(col("embedding")).as("s"))
      .select(col("vec_id"), col("s.maxabs").as("maxabs"),
        col("s.sum_q").as("sum_q"), col("s.min_q").as("min_q"),
        col("s.max_q").as("max_q"),
        round(col("s.recon_err"), 6).as("recon_err"))

  /** The composed higher-order-function form the kernel replaced —
    * four interpreted lambda passes plus three [[DotProductD]] folds
    * per row, kept as the tri-parity REFERENCE implementation
    * (QuantizeCurriculumSpec pins kernel ≡ composed per row): every
    * IEEE operation appears in the same order in both, which is also
    * exactly what the DuckDB oracle states.
    */
  private[graft] def int8AuditComposed(vecs: DataFrame): DataFrame = {
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
