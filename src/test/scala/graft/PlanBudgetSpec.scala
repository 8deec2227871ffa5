package graft

/** Shuffle budget over the ENTIRE query surface: every SparkEntry query
  * has a recorded hash-Exchange count, and any change — a new shuffle
  * sneaking into a refactor, or one disappearing because a subtree got
  * checkpointed out of the visible plan — fails here until consciously
  * re-recorded. The handpicked PlanSpec assertions pin the *why* for
  * key operators; this pins the *what* for all of them.
  *
  * Regenerate after an intentional plan change:
  *   GRAFT_UPDATE_PLAN_BUDGET=1 sbt "testOnly graft.PlanBudgetSpec"
  * then commit the refreshed src/test/resources/shuffle_counts.tsv.
  *
  * Counts are of "Exchange hashpartitioning" in the initial physical
  * plan at sf0.001 (deterministic under fixed conf; rangepartitioning
  * presentation sorts are excluded on purpose — they are oracle-output
  * ordering, not operator shape).
  */
class PlanBudgetSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val budgetFile =
    new java.io.File("src/test/resources/shuffle_counts.tsv")

  /** The winnowed-pairs table is memoized per session
    * (TextAnalysis.winnowPassagePairs); a consumer's plan shape depends
    * on whether the memo is warm (checkpointed scan) or cold (full
    * fingerprint pipeline). Warm it explicitly so every count below is
    * measured in the same state regardless of iteration order — the
    * recorded numbers are the warmed shape, by construction, not by the
    * accident of q_pagerank_dupgraph sorting before text_winnow_pairs.
    */
  private def warmMemos(): Unit =
    operators.TextAnalysis.winnowPassagePairs(spark, dir)

  private def currentCounts(): Seq[(String, Int)] = {
    warmMemos()
    (SparkEntry.queries ++ SparkEntry.benchOnly).toSeq.sortBy(_._1).map { case (name, fn) =>
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      name -> (p.split("Exchange hashpartitioning").length - 1)
    }
  }

  test("hash-shuffle count per query matches the recorded budget") {
    val actual = currentCounts()
    if (sys.env.contains("GRAFT_UPDATE_PLAN_BUDGET")) {
      budgetFile.getParentFile.mkdirs()
      val w = new java.io.PrintWriter(budgetFile, "UTF-8")
      try actual.foreach { case (n, c) => w.println(s"$n\t$c") }
      finally w.close()
      info(s"recorded ${actual.size} budgets to $budgetFile")
    } else {
      assert(budgetFile.exists(),
        s"missing $budgetFile — run GRAFT_UPDATE_PLAN_BUDGET=1 sbt 'testOnly graft.PlanBudgetSpec'")
      val recorded = scala.io.Source.fromFile(budgetFile, "UTF-8").getLines()
        .filter(_.nonEmpty).map { l =>
          val Array(n, c) = l.split("\t"); n -> c.toInt
        }.toMap
      val diffs = actual.flatMap { case (n, c) =>
        recorded.get(n) match {
          case Some(r) if r == c => None
          case Some(r) => Some(s"$n: recorded $r, now $c")
          case None => Some(s"$n: NEW query, no recorded budget")
        }
      }
      val stale = recorded.keySet -- actual.map(_._1).toSet
      assert(diffs.isEmpty && stale.isEmpty,
        ("shuffle budget drift:" +: (diffs ++ stale.map(n => s"$n: query removed")))
          .mkString("\n  "))
    }
  }

  test("no query plans a single-partition global window") {
    // `Window.orderBy` with no partitionBy moves EVERY input row to one
    // partition (Spark's own "WARN WindowExec: No Partition Defined")
    // — correct at test scale, serialized at 100 TB. Global total
    // orders must go through Ranks.global / Ranks.boundedRank instead;
    // this guard turns the runtime warning into a build failure for
    // the whole registered surface.
    warmMemos()
    val offenders = (SparkEntry.queries ++ SparkEntry.benchOnly).toSeq
      .sortBy(_._1).flatMap { case (name, fn) =>
        val windows = fn(spark, dir).queryExecution.optimizedPlan
          .collectWithSubqueries {
            case w: org.apache.spark.sql.catalyst.plans.logical.Window
                if w.partitionSpec.isEmpty =>
              w.windowExpressions.map(_.sql).mkString(", ")
          }
        windows.map(w => s"$name: Window[$w] with empty partition spec")
      }
    assert(offenders.isEmpty, offenders.mkString("\n  "))
  }
}
