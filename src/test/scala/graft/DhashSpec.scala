package graft

import graft.operators.{Dedup, Multimodal}
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Perceptual-hash (dHash) image dedup: the synthesized 9×8 grayscale
  * PNGs round-trip byte-exact through the REAL ImageIO codec (parity
  * with the pure md5 arithmetic the DuckDB oracle replays), similar
  * signatures land at small Hamming distance with a guaranteed exact
  * band, and the banded pair join surfaces exact duplicates at
  * distance 0.
  */
class DhashSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  /** Pure-arithmetic dHash from 16 slice strings — the oracle's math,
    * no codec involved: bit (r,c) = byte c < byte c+1 of
    * md5(h(2r) ‖ h(2r+1)).
    */
  private def expectedDhash(slices: Seq[String]): (Long, Long) = {
    var lo = 0L; var hi = 0L
    for (r <- 0 until 8) {
      val d = md5Hex(slices(2 * r) + slices(2 * r + 1))
      for (c <- 0 until 8) {
        val a = Integer.parseInt(d.substring(2 * c, 2 * c + 2), 16)
        val b = Integer.parseInt(d.substring(2 * c + 2, 2 * c + 4), 16)
        if (a < b) {
          val idx = r * 8 + c
          if (idx < 32) lo |= 1L << idx else hi |= 1L << (idx - 32)
        }
      }
    }
    (lo, hi)
  }

  private def sigsDf(rows: (Long, Seq[String])*) = {
    import spark.implicits._
    val cols = org.apache.spark.sql.functions.col("_1").as("doc_id") +:
      (0 until 16).map(k =>
        org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.col("_2"), k + 1).as(s"h$k"))
    rows.toSeq.toDF().select(cols: _*)
  }

  test("PNG encode→decode round-trip reproduces the md5 arithmetic bit-for-bit") {
    val slicesA = (0 until 16).map(i => md5Hex(s"sliceA$i").take(8))
    val slicesB = (0 until 16).map(i => md5Hex(s"sliceB$i").take(8))
    val media = Multimodal.imagesFromSignatures(sigsDf(1L -> slicesA, 2L -> slicesB))
      .collect().map(m => m.media_id -> m.content).toMap
    for ((id, slices) <- Seq(1L -> slicesA, 2L -> slicesB)) {
      val Some((lo, hi)) = Multimodal.dhash64(media(id))
      assert((lo, hi) === expectedDhash(slices),
        s"codec path diverged from oracle arithmetic for media $id")
    }
  }

  test("shared slices ⇒ shared pixel rows: one differing slice-pair flips ≤ 8 bits") {
    val base = (0 until 16).map(i => md5Hex(s"s$i").take(8))
    val near = base.updated(0, md5Hex("other").take(8)) // only row 0 differs
    val media = Multimodal.imagesFromSignatures(sigsDf(1L -> base, 2L -> near))
      .collect().map(m => m.media_id -> m.content).toMap
    val Some((lo1, hi1)) = Multimodal.dhash64(media(1L))
    val Some((lo2, hi2)) = Multimodal.dhash64(media(2L))
    val hamming = java.lang.Long.bitCount(lo1 ^ lo2) + java.lang.Long.bitCount(hi1 ^ hi2)
    assert(hamming <= 8, s"only bits 0–7 may differ, got $hamming")
    // bits 8..63 (rows 1..7) are identical — bands 1..3 stay exact,
    // so the multi-index join is guaranteed to surface the pair
    assert((lo1 >>> 8) === (lo2 >>> 8) && hi1 === hi2)
  }

  test("dhash64 on an arbitrary-size image: deterministic, and junk degrades to None") {
    val img = new BufferedImage(90, 80, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    for (y <- 0 until 80; x <- 0 until 90)
      img.setRGB(x, y, ((x * 7 + y * 13) % 256) * 0x010101)
    g.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val bytes = bos.toByteArray
    val first = Multimodal.dhash64(bytes)
    assert(first.isDefined, "real image must hash")
    assert(Multimodal.dhash64(bytes) === first, "resample path must be deterministic")
    assert(Multimodal.dhash64("junk bytes".getBytes("UTF-8")).isEmpty)
  }

  test("dhashPairs at sf0.001: every pair verified against independent signature arithmetic") {
    val pairs = Multimodal.dhashPairs(spark, dir).collect()
    assert(pairs.nonEmpty, "corpus contains planted near-duplicates")
    assert(pairs.forall(r => r.getInt(2) <= Multimodal.dhashHammingMax))
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    // recompute each pair's Hamming distance straight from the MinHash
    // signatures (no codec, no join) — the reported distance must match
    val sigs = Dedup.minhashSignatures(spark, dir).collect()
      .map(r => r.getLong(0) -> (0 until 16).map(k => r.getString(k + 1))).toMap
    pairs.foreach { p =>
      val (loA, hiA) = expectedDhash(sigs(p.getLong(0)))
      val (loB, hiB) = expectedDhash(sigs(p.getLong(1)))
      val want = java.lang.Long.bitCount(loA ^ loB) + java.lang.Long.bitCount(hiA ^ hiB)
      assert(p.getInt(2) === want,
        s"pair (${p.getLong(0)}, ${p.getLong(1)}) distance mismatch")
    }
    // planted near-dups share most slices, so the closest pair sits
    // well under the verify ceiling — the banding is doing real work,
    // not sweeping in background pairs at the threshold boundary
    assert(pairs.map(_.getInt(2)).min <= 8)
  }

  test("incremental ingest equals the full pair set restricted to cross-parity") {
    val full = Multimodal.dhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val crossParity = full.filter { case (a, b, _) => a % 2 != b % 2 }
      .map { case (a, b, h) => // (delta odd, base even) orientation
        if (a % 2 == 1) (a, b, h) else (b, a, h)
      }.toSet
    val inc = Multimodal.dhashIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(inc === crossParity)
    assert(inc.forall { case (d, b, _) => d % 2 == 1 && b % 2 == 0 })
  }

  test("dhash clusters: labels cover exactly the paired images, cluster is the min member") {
    val pairs = Multimodal.dhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = Multimodal.dhashClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(labels.keySet === paired, "every paired image is labeled, nothing else")
    // both endpoints of every pair share a label; label = component min
    pairs.foreach { case (a, b) =>
      assert(labels(a) === labels(b), s"pair ($a, $b) split across clusters")
    }
    labels.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.keys.min === cl, s"cluster $cl must be its smallest member")
    }
  }

  test("dhash survivors: one representative per cluster, singletons untouched") {
    val labels = Multimodal.dhashClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val surv = Multimodal.dhashSurvivors(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val domain = Multimodal.dhashIndex(spark, dir).collect()
      .map(_.getLong(0)).toSet
    // exactly the cluster labels survive among paired images
    labels.foreach { case (id, cl) =>
      assert(surv.contains(id) === (id == cl), s"image $id survivor rule")
    }
    // every unpaired image survives
    val paired = labels.map(_._1).toSet
    assert((domain -- paired).subsetOf(surv))
    // count identity: domain − (paired − clusters)
    val nClusters = labels.map(_._2).distinct.length
    assert(surv.size === domain.size - paired.size + nClusters)
  }

  test("signature parity: image path consumes the SAME signatures the LSH family uses") {
    // spot-check one doc: slices from Dedup.minhashSignatures feed the
    // arithmetic that must equal the decoded-image hash
    val sig = Dedup.minhashSignatures(spark, dir).limit(1).collect().head
    val slices = (0 until 16).map(k => sig.getString(k + 1))
    val fromIndex = Multimodal.dhashIndex(spark, dir)
      .filter(org.apache.spark.sql.functions.col("media_id") === sig.getLong(0))
      .collect().head
    val (lo, hi) = expectedDhash(slices)
    assert((fromIndex.getLong(2), fromIndex.getLong(1)) === ((lo, hi)))
  }
}
