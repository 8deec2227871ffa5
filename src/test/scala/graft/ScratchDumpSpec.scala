package graft

import graft.operators.{Analytics, BpeTrainer}

/** Throwaway dump for oracle prototyping — deleted before commit. */
class ScratchDumpSpec extends SparkSpec {
  test("dump changed queries at sf0.01 and sf0.1") {
    for (sf <- Seq("0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      Analytics.approxUserCounts(spark, dir)
        .write.mode("overwrite").parquet(s"/tmp/scratch_$sf/q_approx_distinct")
      Analytics.approxOrderPercentiles(spark, dir)
        .write.mode("overwrite").parquet(s"/tmp/scratch_$sf/q_approx_percentiles")
      BpeTrainer.train(spark, dir)
        .write.mode("overwrite").parquet(s"/tmp/scratch_$sf/text_bpe_merges")
      BpeTrainer.fertility(spark, dir)
        .write.mode("overwrite").parquet(s"/tmp/scratch_$sf/text_bpe_fertility")
    }
  }
}
