package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale-rehearsal fixture invariants [[graft.tools.ScaleGen]]
  * rests on — the properties that keep truth-pair counts scaling
  * EXACTLY linearly (cross-replica pairs impossible), which is what
  * makes a slope reading at ×10/×100 attributable to the ENGINE and
  * not the fixture.
  */
class ScaleGenSpec extends AnyFunSuite {

  private def lev(a: String, b: String): Int = {
    var prev = (0 to b.length).toArray
    for (i <- 1 to a.length) {
      val cur = new Array[Int](b.length + 1)
      cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      prev = cur
    }
    prev(b.length)
  }

  test("replica name tags keep every cross-replica pair past the " +
    "fuzzy lev <= 2 threshold through factor 128") {
    // adversarial base names: run-endings that could merge with a
    // tag's letter runs, plus the real TPC-H shape
    val names = Seq("Customer#000000001", "x", "x aaa", "x bbb",
      "end aaa", "b ab")
    for (nm <- names; j <- 0 to 128; k <- (j + 1) to 128) {
      val d = lev(nm + tools.ScaleGen.replicaTag(j),
        nm + tools.ScaleGen.replicaTag(k))
      assert(d >= 3, s"tag pair ($j, $k) on '$nm' reaches lev $d < 3 — " +
        "cross-replica fuzzy pairs would corrupt the rehearsal truth")
    }
  }

  test("cross-NAME cross-replica pairs stay past lev <= 2 for " +
    "equal-length base names (the corpus shape) through factor 128") {
    // round-18 advice: the same-name sweep above misses pairs where
    // DIFFERENT base names interact with DIFFERENT tags. For bases of
    // equal length (the TPC-H `Customer#%09d` corpus is fixed-width)
    // the tags cannot slide into the base text, so every cross-replica
    // pair must stay >= 3 regardless of which names carry the tags —
    // brute-forced here over adversarial equal-length bases whose
    // endings mimic tag letter runs.
    val names = Seq("Customer#000000001", "Customer#000000002",
      "Customer#0000aaa01", "Customer#000000aaa", "Customer#000000bbb",
      "Customer#00000aaaa")
    for {
      a <- names.indices; b <- (a + 1) until names.length
      j <- 0 to 128; k <- 0 to 128
      if j != k // same-tag cross-name distance is the base corpus's own
    } {
      val d = lev(names(a) + tools.ScaleGen.replicaTag(j),
        names(b) + tools.ScaleGen.replicaTag(k))
      assert(d >= 3, s"cross-name tag pair ($j, $k) on " +
        s"'${names(a)}'/'${names(b)}' reaches lev $d < 3")
    }
  }

  test("the equal-length precondition is real: unequal-length bases " +
    "can collide cross-replica (documented boundary, not a bug)") {
    // the advice's counterexample — 'x'+tag(26) vs 'x aaa'+tag(1) is
    // lev 1: the shorter base's tag aligns into the longer base's own
    // text. This is WHY replicaTag's scaladoc scopes the guarantee to
    // equal-length base names; the generated corpora satisfy it.
    val d = lev("x" + tools.ScaleGen.replicaTag(26),
      "x aaa" + tools.ScaleGen.replicaTag(1))
    assert(d <= 2, s"expected the documented unequal-length collision, got lev $d")
  }

  test("replica tags are length-preserving in word count and unique") {
    val tags = (0 to 128).map(tools.ScaleGen.replicaTag)
    assert(tags.distinct.size === tags.size)
    // every non-base tag is ' ' + one or two tripled letter runs
    tags.drop(1).foreach { t =>
      assert(t.head === ' ' && (t.length == 4 || t.length == 7), t)
      assert(t.drop(1).grouped(3).forall(g => g.distinct.length == 1), t)
    }
  }
}
