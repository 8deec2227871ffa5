package graft

import graft.operators.{Dsir, Sampling}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Context-window chunking, deterministic shuffle order, and the DSIR
  * train-batch/serve-stream split — the semantic properties behind the
  * oracle hashes.
  */
class ChunkShuffleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("chunks: full coverage, correct strides, no dangling tail") {
    val ch = Sampling.chunkWindows(spark, dir)
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("nt"))
    val byDoc = ch.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max(col("start_tok") + col("n_tok")).as("covered"),
      min("n_tok").as("min_tok"))
      .join(docs, "doc_id")
    // the final window reaches the document's tail exactly
    assert(byDoc.filter(col("covered") =!= col("nt")).count() === 0L)
    // every chunk starts on a stride boundary and is at most chunkSize
    assert(ch.filter(col("start_tok") % Sampling.chunkStride =!= 0 ||
      col("n_tok") > Sampling.chunkSize || col("n_tok") < 1).count() === 0L)
    // chunk k of a doc with nt tokens exists iff k*stride < nt (short
    // docs: one chunk)
    val expected = docs.select(col("doc_id"),
      (lit(1) + when(col("nt") > Sampling.chunkSize,
        floor((col("nt") - Sampling.chunkSize + (Sampling.chunkStride - 1)) /
          lit(Sampling.chunkStride))).otherwise(lit(0))).as("want"))
    assert(byDoc.join(expected, "doc_id")
      .filter(col("n_chunks") =!= col("want")).count() === 0L)
    // text round-trip: a chunk's text re-splits to exactly n_tok tokens
    assert(ch.filter(size(split(col("chunk_text"), " ")) =!=
      col("n_tok")).count() === 0L)
  }

  test("chunks: consecutive windows overlap by size - stride") {
    val ch = Sampling.chunkWindows(spark, dir)
    val pairs = ch.as("a").join(ch.as("b"),
      col("a.doc_id") === col("b.doc_id") &&
        col("a.chunk_id") + 1 === col("b.chunk_id"))
    // a full-size window overlaps its successor's start by 16 tokens
    assert(pairs.filter(col("a.n_tok") === Sampling.chunkSize &&
      col("a.start_tok") + col("a.n_tok") - col("b.start_tok") =!=
        (Sampling.chunkSize - Sampling.chunkStride)).count() === 0L)
  }

  test("shuffle order: a permutation, stable under recomputation, " +
    "not the identity") {
    val s1 = Sampling.shuffleOrder(spark, dir)
    val n = Tables(spark, dir, "documents").count()
    assert(s1.count() === n)
    assert(s1.agg(countDistinct("doc_id")).head().getLong(0) === n)
    assert(s1.agg(min("position"), max("position")).head() match {
      case r => r.getLong(0) == 1L && r.getLong(1) == n
    })
    val s2 = Sampling.shuffleOrder(spark, dir)
    assert(s1.exceptAll(s2).count() === 0L)
    // genuinely shuffled: most docs move away from their id order
    val moved = s1.filter(col("position") =!= col("doc_id") + 1).count()
    assert(moved > n / 2)
  }

  test("dsir: streaming scores from trained weights match the batch run") {
    implicit val sqlc = spark.sqlContext
    import spark.implicits._

    val w = Dsir.trainedWeights(spark, dir)
    assert(w.length === Dsir.numBuckets)
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()

    val in = MemoryStream[(Long, String)]
    val q = Dsir.streamingScores(in.toDF().toDF("doc_id", "text"), w)
      .writeStream.outputMode("append").format("memory")
      .queryName("dsir_stream").start()
    try {
      val (wave1, wave2) = docs.splitAt(docs.length / 2)
      in.addData(wave1.toSeq); q.processAllAvailable()
      in.addData(wave2.toSeq); q.processAllAvailable()
      val streamed = spark.table("dsir_stream")
      assert(streamed.count() === docs.length.toLong)
      val batch = Dsir.weights(spark, dir)
      val joined = streamed.join(batch, "doc_id")
      assert(joined.count() === docs.length.toLong)
      assert(joined.filter(
        streamed("dsir_logw") =!= batch("dsir_logw") ||
          streamed("selected") =!= batch("selected")).count() === 0L)
    } finally q.stop()
  }
}
