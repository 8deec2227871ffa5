package graft

import graft.operators.Dedup
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pigeonhole recall property of the SimHash banding: ≤3 bit flips
  * touch at most 3 of the 4 bands, so every pair within the verify
  * threshold (Hamming ≤ 3) shares at least one intact band key — the
  * guarantee [[Dedup.simhashPairs]]'s candidate generation relies on.
  *
  * The generator is ADVERSARIAL: flip positions are biased onto band
  * boundaries (0/15/16/31/32/47/48/63) and drawn to straddle distinct
  * bands, the worst case for banding — a refactor that misaligns band
  * offsets or widths fails here before it fails the (sampled) corpus
  * recall test in ExtensionOpsSpec. (Raw ScalaCheck generators drawn
  * with explicit seeds: the scalatestplus bridge is not in the offline
  * dependency cache.)
  */
class SimHashBandPropertySpec extends AnyFunSuite {

  private val boundaryBits = Seq(0, 15, 16, 31, 32, 47, 48, 63)

  /** (fingerprint, ≤3 distinct flip positions), boundary-biased and
    * band-straddling.
    */
  private val genCase: Gen[(Long, List[Int])] = for {
    fp <- Gen.long
    k <- Gen.choose(0, 3)
    // straddle: at most one flip per band where possible, biased to edges
    pos <- Gen.listOfN(k, Gen.frequency(
      3 -> Gen.oneOf(boundaryBits),
      1 -> Gen.choose(0, 63)))
  } yield (fp, pos.distinct)

  test("≤3 flips (boundary-adversarial) always leave ≥1 intact band") {
    (0 until 2000).foreach { i =>
      val (fp, flips) = genCase.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val flipped = flips.foldLeft(fp)((v, b) => v ^ (1L << b))
      val before = Dedup.simhashBandKeys(fp)
      val after = Dedup.simhashBandKeys(flipped)
      assert(java.lang.Long.bitCount(fp ^ flipped) <= 3)
      assert(before.zip(after).exists { case (a, b) => a == b },
        s"no intact band for fp=$fp flips=$flips")
    }
  }

  test("exhaustive: every 3-subset of one-bit-per-band positions keeps a 4th band intact") {
    // The sharpest adversary: three flips in three DIFFERENT bands —
    // exactly one band must survive. Exhaust all band triples × edge
    // positions within each band.
    val edgesPerBand = (0 until 4).map(b => Seq(b * 16, b * 16 + 15))
    for {
      bands <- (0 until 4).combinations(3)
      choice <- bands.map(edgesPerBand).foldLeft(Seq(Seq.empty[Int])) {
        (acc, edges) => acc.flatMap(c => edges.map(c :+ _))
      }
    } {
      val fp = 0x5A5A5A5A5A5A5A5AL
      val flipped = choice.foldLeft(fp)((v, b) => v ^ (1L << b))
      val intact = Dedup.simhashBandKeys(fp).zip(Dedup.simhashBandKeys(flipped))
        .zipWithIndex.collect { case ((a, b), i) if a == b => i }
      val untouched = (0 until 4).filterNot(bands.contains)
      assert(intact.toSet === untouched.toSet,
        s"bands $bands flipped at $choice: intact=$intact expected=$untouched")
    }
  }

  test("4 flips in 4 distinct bands CAN break every band (threshold is tight)") {
    val fp = 0x0123456789ABCDEFL
    val flipped = (0 until 4).foldLeft(fp)((v, b) => v ^ (1L << (b * 16)))
    val intact = Dedup.simhashBandKeys(fp).zip(Dedup.simhashBandKeys(flipped))
      .count { case (a, b) => a == b }
    assert(intact === 0)
  }
}
