package graft

import graft.operators.Dedup
import org.apache.spark.sql.SaveMode

/** Semantics of the edit-distance verify over LSH candidates
  * (`dedup_edit_verify`): planted near-identical documents must
  * surface as a verified pair with the exact Levenshtein distance a
  * JVM reference computes; unrelated documents must never pair; and
  * the prefix bound must cap the verify cost on arbitrarily long
  * documents.
  */
class EditVerifySpec extends SparkSpec {

  /** Reference Levenshtein (two-row DP). */
  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  private def writeDocs(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("editv").toString
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "web", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted near-dups pair with the reference edit distance; strangers don't") {
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again while the river runs south past the old stone mill " +
      "where the miller keeps a ledger of every sack of grain that " +
      "crosses the threshold and the seasons turn slowly over the " +
      "valley as carts roll in from the villages beyond the ridge"
    val nearDup = base.replace("quick", "quiet").replace("south", "north")
    val unrelated = "completely different content about matrix " +
      "multiplication kernels on tensor cores with fused epilogues"
    val dir = writeDocs(Seq(base, nearDup, unrelated, base))
    val out = Dedup.editDistancePairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getAs[Long]("edit_dist"), r.getAs[Boolean]("is_dup")))).toMap
    // exact copy (0,3) and near-dup (0,1)/(1,3) must all surface
    assert(out.contains((0L, 3L)) && out((0L, 3L)) === (0L, true))
    assert(out.contains((0L, 1L)), "near-dup must band-collide")
    val expect = lev(base.toLowerCase.take(Dedup.editPrefixLen),
      nearDup.toLowerCase.take(Dedup.editPrefixLen)).toLong
    assert(out((0L, 1L)) === (expect, expect <= Dedup.editMaxDist))
    // the unrelated doc never appears on any pair
    assert(out.keys.forall { case (a, b) => a != 2L && b != 2L })
  }

  test("prefix bound: distance is computed over at most editPrefixLen chars") {
    // two near-identical docs whose ONLY difference sits past the
    // 80-char prefix: the full-text distance is large, but the verify
    // must read 0 edits — proof it is bounded by the prefix
    val head = "shared prefix " * 6 // 84 chars
    val tail = "alpha beta gamma delta epsilon zeta " * 20
    val a = head + tail
    val b = head + tail + "zz extra trailing block not in the prefix"
    val dir = writeDocs(Seq(a, b))
    val rows = Dedup.editDistancePairs(spark, dir).collect()
    val pair = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(pair.nonEmpty, "shared-body docs must band-collide")
    assert(pair.get.getAs[Long]("edit_dist") === 0L)
    assert(pair.get.getAs[Boolean]("is_dup"))
  }
}
