package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the serial-fidelity batch selector, focused on the
  * self-pair rule (ADVICE r4, high): merging (s, s) creates (ss, ss)
  * instances bounded only by the pair's own count, which the
  * lefts/rights conflict scan never covers — a self-pair may only
  * close a batch, never sit in the middle of one.
  */
class BpeSelectBatchSpec extends AnyFunSuite {

  private def select(top: Seq[(String, String, Long)],
                     symbols: Set[String]): Seq[(String, String, Long)] =
    BpeTrainer.selectBatch(top, sawWholeTable = true, maxAccept = 64,
      symbols = symbols)

  test("argmax self-pair is accepted alone and closes the batch") {
    // the ADVICE counterexample's round 1: {aaaaaa:60, cde:50, cdf:50}
    // gives (a,a,300) then (c,d,100); accepting (c,d) alongside would
    // skip serial's (aa,aa,120) round
    val top = Seq(("a", "a", 300L), ("c", "d", 100L), ("d", "e", 50L))
    assert(select(top, Set("a", "c", "d", "e", "f", "</w>")) ===
      Seq(("a", "a", 300L)))
  }

  test("later self-pair is accepted as the batch's final member") {
    val top = Seq(("x", "y", 300L), ("e", "e", 100L), ("c", "d", 50L))
    assert(select(top, Set("x", "y", "e", "c", "d")) ===
      Seq(("x", "y", 300L), ("e", "e", 100L)))
  }

  test("self-pair tied with an earlier member closes the batch without it") {
    // keeping (e,e,100) while the count filter drops the tied (c,d,100)
    // would reorder serial — the self-pair must wait for its own round
    val top = Seq(("c", "d", 100L), ("e", "e", 100L), ("g", "h", 50L))
    assert(select(top, Set("c", "d", "e", "g", "h")) ===
      Seq(("c", "d", 100L)))
  }

  test("self-pair conflicting with an accepted member is a plain barrier") {
    // (e,e)'s left e is already an accepted pair's right → its count
    // changes when that merge applies; it cannot join or close-accept
    val top = Seq(("f", "e", 200L), ("e", "e", 100L), ("g", "h", 99L))
    assert(select(top, Set("f", "e", "g", "h")) ===
      Seq(("f", "e", 200L)))
  }

  test("non-self pairs after a closing self-pair are excluded even above 2") {
    val top = Seq(("e", "e", 100L), ("c", "d", 99L))
    assert(select(top, Set("e", "c", "d")) === Seq(("e", "e", 100L)))
  }
}
