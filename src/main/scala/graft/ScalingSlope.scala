package graft

import org.apache.spark.sql.SparkSession

/** Scaling-slope audit: times the most expensive bench rows at two
  * scale factors (default sf0.01 vs sf0.1 — 10× the data) in ONE JVM
  * and reports each row's growth factor and log-slope
  * exponent = log(t_big/t_small) / log(10). A linear operator reads
  * exponent ≤ 1; fixed overhead pulls it below; anything persistently
  * ABOVE ~1.1 (growth > ~13× for 10× data) is flagged — the early
  * warning for an accidental quadratic (all-pairs join, unbounded
  * window) that tri-scale CORRECTNESS checks cannot catch because
  * they only assert values.
  *
  * Interpreting flags honestly: at sf0.01→0.1 many rows are still
  * overhead-dominated (sub-second), so their ratio is noisy upward —
  * the tool times min-of-REPS and flags only past the threshold, and
  * the round record, not the tool, is where a flagged row gets its
  * cause written down (documented super-linear shapes exist: n·log n
  * sorts, vocab² PMI marginals at tiny vocab).
  *
  * Usage:
  *   sbt "runMain graft.ScalingSlope [topN]"          # default 10
  *   SPARK_GRAFT_SLOPE_SMALL/_BIG override the two dirs.
  */
object ScalingSlope {
  def main(args: Array[String]): Unit = {
    val topN = args.headOption.map(_.toInt).getOrElse(10)
    val small = sys.env.getOrElse("SPARK_GRAFT_SLOPE_SMALL", "/root/testdata/sf0.01")
    val big = sys.env.getOrElse("SPARK_GRAFT_SLOPE_BIG", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val flagAt = sys.env.getOrElse("SPARK_GRAFT_SLOPE_FLAG", "1.1").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val benched = SparkEntry.queries ++ SparkEntry.benchOnly
    // "most expensive" by the recorded budget — the rows whose shape
    // matters; budget file rows missing from the map are skipped
    val budget = scala.io.Source
      .fromInputStream(getClass.getResourceAsStream("/bench_budget.tsv"), "UTF-8")
      .getLines().filter(_.nonEmpty).map { l =>
        val Array(n, t) = l.split("\t"); n -> t.toDouble
      }.toSeq
    val targets = budget.filter(r => benched.contains(r._1))
      .sortBy(-_._2).take(topN).map(_._1)
    def time(name: String, dir: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        benched(name)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup (plans, codegen, per-dataset memos)
      (1 to reps).map(_ => once()).min
    }
    println(f"[slope] ${"query"}%-28s ${"t_small"}%8s ${"t_big"}%8s ${"ratio"}%7s ${"exp"}%6s flag")
    var flagged = 0
    targets.foreach { name =>
      val ts = time(name, small)
      val tb = time(name, big)
      val ratio = tb / ts
      val exp = math.log10(ratio)
      val flag = exp > flagAt
      if (flag) flagged += 1
      println(f"[slope] $name%-28s $ts%8.3f $tb%8.3f $ratio%7.2f $exp%6.2f ${if (flag) "SUPER-LINEAR" else "ok"}")
    }
    println(s"[slope] ${targets.size} rows audited, $flagged flagged at exponent > $flagAt")
    spark.stop()
    if (flagged > 0) sys.exit(2)
  }
}
