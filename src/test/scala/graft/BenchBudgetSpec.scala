package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps the per-query bench budget (src/main/resources/
  * bench_budget.tsv, the 1.5× regression gate `Bench` and
  * tools/check_bench_budget.py enforce) in lockstep with the benched
  * surface: a new query without a recorded budget, or a stale budget
  * row for a removed query, fails here — the same name-sync discipline
  * PlanBudgetSpec applies to shuffle counts. Timing itself is NOT
  * asserted in unit tests (a shared CI host can't hold a wall-clock
  * bar); the recorded values are checked for plausibility only.
  */
class BenchBudgetSpec extends AnyFunSuite {

  test("bench budget file covers exactly the benched query surface") {
    val in = getClass.getResourceAsStream("/bench_budget.tsv")
    assert(in != null,
      "missing bench_budget.tsv — run the bench and record it via " +
        "tools/check_bench_budget.py <capture> --update")
    val budget = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val parts = l.split("\t")
        assert(parts.length === 2, s"malformed budget line: $l")
        parts(0) -> parts(1).toDouble
      }.toMap
    val benched = (SparkEntry.queries ++ SparkEntry.benchOnly).keySet
    val missing = benched -- budget.keySet
    val stale = budget.keySet -- benched
    assert(missing.isEmpty && stale.isEmpty,
      s"budget drift — missing: ${missing.toSeq.sorted.mkString(",")} " +
        s"stale: ${stale.toSeq.sorted.mkString(",")}")
    budget.foreach { case (n, t) =>
      assert(t > 0 && t < 600, s"$n: implausible recorded time $t")
    }
  }
}
