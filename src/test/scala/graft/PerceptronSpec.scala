package graft

import graft.operators.Perceptron
import org.apache.spark.sql.functions._

/** The batch perceptron's training mechanics: deterministic under
  * repartitioning, epoch-1 update equal to the hand-computed full-set
  * sum, scoring consistent with the weights — and genuine learning on
  * a corpus where the label actually correlates with the features
  * (the driver's synthetic corpus is deliberately unlearnable: every
  * language draws the same vocabulary).
  */
class PerceptronSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("training is deterministic and pred_en == (score > 0)") {
    val w1 = Perceptron.trainedWeights(spark, dir).toSeq
    val w2 = Perceptron.trainedWeights(spark, dir).toSeq
    assert(w1 === w2, "same corpus, same weights")
    val out = Perceptron.classifier(spark, dir).cache()
    try {
      assert(out.filter(col("pred_en") =!= (col("score") > 0)).isEmpty)
      assert(out.count() === Tables(spark, dir, "documents").count())
    } finally out.unpersist()
  }

  test("epoch 1 from w=0 updates on every document: w1 == sum(y * x)") {
    // recompute the full-set feature sums independently of the trainer
    val toks = split(trim(col("text")), " ")
    val y = when(col("lang") === "en", 1L).otherwise(-1L)
    val sums = Tables(spark, dir, "documents")
      .agg(
        sum(y * lit(1L)).as("d0"),
        sum(y * size(toks).cast("long")).as("d1"),
        sum(y * length(col("text")).cast("long")).as("d2"),
        sum(y * size(filter(toks, t => t.isInCollection(
          Seq("the", "a", "of", "and", "in", "to", "is")))).cast("long")).as("d3"),
        sum(y * regexp_count(col("text"), lit("[0-9]")).cast("long")).as("d4"),
        sum(y * regexp_count(col("text"), lit("[.,!?;:]")).cast("long")).as("d5"))
      .head()
    val expected = (0 until 6).map(sums.getLong)
    val w1 = Perceptron.train(Perceptron.features(spark, dir), nEpochs = 1)
    assert(w1.toSeq === expected, "epoch-1 weights are the full-set sums")
  }

  test("streaming scorer: per-row parity with the batch classifier across micro-batches") {
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val w = Perceptron.trainedWeights(spark, dir)
    // batch truth over a slice of the corpus
    val batch = Perceptron.classifier(spark, dir)
      .select("doc_id", "score", "pred_en").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text", "lang").limit(40)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val in = MemoryStream[(Long, String, String)]
    val q = Perceptron.streamingScores(
        in.toDF().toDF("doc_id", "text", "lang"), w)
      .writeStream.outputMode("append").format("memory")
      .queryName("perc_stream").start()
    try {
      val (wave1, wave2) = docs.splitAt(20)
      in.addData(wave1.toIndexedSeq); q.processAllAvailable()
      in.addData(wave2.toIndexedSeq); q.processAllAvailable()
      val streamed = spark.table("perc_stream").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(streamed.size === 40)
      streamed.foreach { case (id, sp) =>
        assert(sp === batch(id), s"doc $id diverges from the batch scorer")
      }
    } finally q.stop()
  }

  test("learns a separable signal to >95% accuracy that majority vote cannot reach") {
    import spark.implicits._
    // en docs carry stopwords + punctuation; non-en carry digits —
    // both classes same length so no single degenerate feature wins
    val docs = ((1L to 60L).map(i =>
      (i, s"the cat of the hill is in a box, and it is fine to rest; doc $i", "en")) ++
      (61L to 100L).map(i =>
        (i, s"zzz 123 456 789 000 111 222 333 444 555 666 777 888 999 doc $i", "zh")))
      .toDF("doc_id", "text", "lang")
    val tmp = java.nio.file.Files.createTempDirectory("perc2").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Perceptron.classifier(spark, tmp).cache()
    try {
      val n = out.count().toDouble
      val correct = out.filter(col("pred_en") === col("is_en")).count().toDouble
      assert(correct / n > 0.95, s"accuracy ${correct / n}")
      // majority vote would cap at 60%
      assert(out.filter(col("pred_en")).count() > 0, "not all-negative")
      assert(out.filter(!col("pred_en")).count() > 0, "not all-positive")
    } finally out.unpersist()
  }
}
