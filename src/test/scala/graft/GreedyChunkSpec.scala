package graft

import graft.functions.{GreedyChunkEnds, GreedyChunkKernel}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The greedy word-boundary chunker: hand-derived packs, the
  * oversized-word rule, the exact-partition property on the corpus,
  * tri-parity (kernel / codegen plan / SQL registration), and byte
  * certification through the md5 column.
  */
class GreedyChunkSpec extends SparkSpec {

  private def ends(s: String, mx: Int): Seq[Int] =
    GreedyChunkKernel.chunkEnds(UTF8String.fromString(s), mx)
      .toIntArray().toSeq

  test("hand-derived packs: empty, single word, split, exact-fit") {
    assert(ends("", 10) === Seq.empty)
    assert(ends("abc", 10) === Seq(3))
    // units end at 3 ("aa "), 6 ("bb "), 8 ("cc"): 5-char budget packs
    // "aa " alone (adding "bb " would reach 6), then "bb cc"
    assert(ends("aa bb cc", 5) === Seq(3, 8))
    // exact fit: "aa bb" is exactly 5 chars → one chunk
    assert(ends("aa bb", 5) === Seq(5))
  }

  test("oversized word becomes its own chunk, never split mid-word") {
    assert(ends("abcdefghij", 3) === Seq(10))
    assert(ends("abcdefghij xy", 3) === Seq(11, 13))
    // the oversized unit in the middle: previous chunk closes first
    assert(ends("ab abcdefghij cd", 4) === Seq(3, 14, 16))
  }

  test("corpus: chunks partition every document exactly, budget respected") {
    val dir = "/root/testdata/sf0.001"
    val chunks = TextAnalysis.greedyChunks(spark, dir).collect()
      .groupBy(_.getLong(0))
    val texts = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet === texts.keySet.filter(texts(_).nonEmpty))
    chunks.foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // contiguous partition: starts chain from 1 to len(text)
      assert(sorted.head.getLong(2) === 1L)
      assert(sorted.last.getLong(3) === texts(doc).length.toLong)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(2) === a.getLong(3) + 1)
        case _ =>
      }
      sorted.foreach { r =>
        val len = r.getLong(4)
        val sub = texts(doc).substring(
          r.getLong(2).toInt - 1, r.getLong(3).toInt)
        // budget holds unless the chunk is a single oversized word
        // (= contains no internal space except a trailing one)
        if (len > TextAnalysis.greedyChunkMax)
          assert(!sub.dropRight(1).contains(' '), s"doc $doc oversize chunk")
        // byte certification recomputed
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(sub.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
        assert(r.getString(5) === md)
      }
    }
  }

  test("tri-parity: SQL registration and native codegen in the plan") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, "aa bb cc"), (2L, "")).toDF("id", "t").createOrReplaceTempView("gct")
    val viaSql = spark.sql("SELECT id, greedy_chunk_ends(t, 5) AS e FROM gct")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(viaSql(1L) === Seq(3, 8))
    assert(viaSql(2L) === Seq.empty)
    // the operator's checkpoint hides the kernel stage behind an
    // ExistingRDD scan; assert the kernel's own projection separately
    val kernelPlan = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(GreedyChunkEnds(col("text"), TextAnalysis.greedyChunkMax).as("e"))
      .queryExecution.executedPlan.toString
    assert(kernelPlan.contains("greedy_chunk_ends"),
      s"expected the native kernel in the plan:\n$kernelPlan")
    assert(!kernelPlan.toLowerCase.contains("lambdafunction"), kernelPlan)
    val opPlan = TextAnalysis.greedyChunks(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(opPlan.contains("ExistingRDD"),
      s"expected the pre-explode checkpoint boundary:\n$opPlan")
  }
}
