package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Per-source quality calibration: every source keeps its own top
  * quantile — a weak source whose best doc scores below a strong
  * source's worst still keeps its quota, which is the entire point
  * over a single global threshold.
  */
class QualityCalibratedSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qcal").toString
    rows.map { case (id, text, src) => (id, text, "en", src) }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  test("a weak source keeps its quota even when outscored wholesale") {
    // source 'web': 8 long prose docs (scores ~40); source 'ocr': 8
    // short low-stopword docs (scores ~3) — a global top-25% cut
    // would be 100% 'web'; the calibrated cut keeps 2 of each
    val prose = "the quick brown fox jumps over a lazy dog in the sunny " +
      "meadow and all of the animals gather to watch the show"
    val rows =
      (0L until 8L).map(i => (i, prose + (" extra" * i.toInt), "web")) ++
      (100L until 108L).map(i => (i, s"frag${i} ment noise bits", "ocr"))
    val got = TextAnalysis.qualityCalibrated(spark, writeDocs(rows)).collect()
    val bySrc = got.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(bySrc === Map("web" -> 2, "ocr" -> 2),
      s"each source keeps floor-of-25%: $bySrc")
    // within each source the kept docs are its top-ranked ones
    got.foreach(r => assert(r.getLong(3) <= 2L))
    assert(got.forall(_.getDouble(4) <= TextAnalysis.calibratedKeepShare))
  }

  test("sf0.001: kept share per source is the quantile, ranks dense from 1") {
    val dir = "/root/testdata/sf0.001"
    val total = Tables(spark, dir, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextAnalysis.qualityCalibrated(spark, dir).collect()
    val bySrc = kept.groupBy(_.getString(1))
    assert(bySrc.keySet === total.keySet, "no source is emptied")
    bySrc.foreach { case (src, rows) =>
      val want = math.floor(total(src) * TextAnalysis.calibratedKeepShare).toLong
      assert(rows.length.toLong === want, s"$src keeps exactly its quantile")
      assert(rows.map(_.getLong(3)).sorted.toSeq === (1L to rows.length),
        s"$src ranks dense from 1")
    }
  }
}
