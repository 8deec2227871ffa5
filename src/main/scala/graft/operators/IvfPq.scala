package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ — the combined index both halves were built for: the trained
  * IVF cells ([[Similarity]], k = ⌈√N⌉, top-2-cell probing) restrict
  * the candidate set to O(nprobe·√N) per query, and the trained PQ
  * codebooks ([[Pq]]) score those candidates in the compressed domain
  * (ADC), with exact re-ranking of the shortlist. This is the
  * billion-scale ANN architecture: cells bound the scan, codes bound
  * the bytes per candidate, exact arithmetic touches only a
  * constant-size shortlist.
  *
  * Both model artifacts are the memoized driver-side trainings the
  * standalone rows already certify (`ann_ivf*`, `ann_pq*`); this row
  * certifies their COMPOSITION — every stage deterministic, the DuckDB
  * oracle replaying cell training, codebook training, probing, ADC,
  * and re-rank end-to-end.
  *
  * Truth metric: exact squared-L2 argmin (the quantity ADC
  * approximates), over the same fixed-size query sample as the IVF
  * rows ([[Similarity.annQuerySampleSize]] smallest ids matching the
  * 1-in-5 predicate) — the truth cartesian is O(N·sample) with a
  * constant-size query broadcast at any corpus scale.
  */
object IvfPq {

  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProductD(a, b)

  /** Rank-3 recall of IVF-probed, ADC-scored, exactly re-ranked search
    * vs exact L2 over the sampled queries; `recall_adc` isolates the
    * compressed-domain stage, `recall` the full two-stage pipeline.
    */
  def ivfPqRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val withNrm = emb.withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
    // stage 0: trained coarse cells + trained codebooks (both memoized)
    import spark.implicits._
    val centroids = Similarity.trainedCentroids(spark, dir).toDF("c_id", "c_emb")
    val assigned = Similarity.assignCells(withNrm, centroids)
    val probes = Similarity.queryProbes(assigned, centroids, nprobe = 2)
    val codebook = Pq.codebookDf(spark, dir)
    val codes = Pq.assign(Pq.subspaceRows(emb), codebook)
      .select(col("vec_id"), col("m"), col("code"))
    // stage 1: cell-restricted candidates (≈ nprobe·√N per query)
    val cand = probes.select(col("q_id"), col("q_cell"))
      .join(assigned.select(col("vec_id"), col("cell")),
        col("cell") === col("q_cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")
    // stage 2: ADC over the candidates (query LUT × candidate codes)
    val lut = Pq.subspaceRows(Similarity.sampleQueries(emb))
      .withColumnRenamed("vec_id", "q_id")
      .join(broadcast(codebook), "m")
      .select(col("q_id"), col("m"), col("c_id"),
        Pq.dist2(col("sub"), col("c_emb")).as("term"))
    val adc = cand
      .join(codes, "vec_id")
      .join(lut, Seq("q_id", "m"))
      .filter(col("c_id") === col("code"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sort_array(collect_list(struct(col("m"), col("term")))).as("ts"))
      .select(col("q_id"), col("vec_id"),
        round(expr("aggregate(ts, CAST(0 AS DOUBLE), (acc, t) -> acc + t.term)"), 4).as("adc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    val shortlist = adc.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Pq.pqShortlist)
    val adcTop3 = shortlist.filter(col("rn") <= 3)
      .groupBy(col("q_id")).agg(collect_set(col("vec_id")).as("adc_cands"))
    // stage 3: exact re-rank of the shortlist
    val queries = Similarity.sampleQueries(emb)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val rescored = shortlist.select("q_id", "vec_id")
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .join(broadcast(queries), "q_id")
      .withColumn("d2", Pq.dist2(col("embedding"), col("q_emb")))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    val rerankTop3 = rescored.withColumn("rn", row_number().over(wr))
      .filter(col("rn") <= 3)
      .groupBy(col("q_id")).agg(collect_set(col("vec_id")).as("rr_cands"))
    // truth: exact L2 argmin over the full corpus
    val truth = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("d2", Pq.dist2(col("embedding"), col("q_emb")))
      .groupBy(col("q_id"))
      .agg(min_by(col("vec_id"), struct(col("d2"), col("vec_id"))).as("true_nn"))
    truth
      .join(adcTop3, Seq("q_id"), "left")
      .join(rerankTop3, Seq("q_id"), "left")
      .select(col("q_id"),
        when(array_contains(col("adc_cands"), col("true_nn")), 1).otherwise(0).as("hit_adc"),
        when(array_contains(col("rr_cands"), col("true_nn")), 1).otherwise(0).as("hit_rr"))
      .agg(count(lit(1)).as("n_queries"),
        (sum(col("hit_adc")).cast("double") / count(lit(1))).as("recall_adc"),
        (sum(col("hit_rr")).cast("double") / count(lit(1))).as("recall"))
      .select(lit("ivfpq").as("method"), col("n_queries"),
        col("recall_adc"), col("recall"))
  }
}
