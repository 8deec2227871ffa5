package graft

import graft.functions.NgramMinHashMd5
import org.apache.spark.sql.functions._

/** The native MinHash expression must agree bit-for-bit with the
  * composed-builtin definition it replaces (and with the DuckDB oracle):
  * per 8-code-point window g, the seeded digest family md5(g),
  * md5(g || '1'), … sliced into 8-hex-char substrings, min per slice.
  */
class NgramMinHashSpec extends SparkSpec {

  private def builtinForm(n: Int, k: Int) = {
    val grams = expr(
      s"transform(sequence(1, length(s) - ${n - 1}), i -> substring(s, i, $n))")
    (0 until k).map { j =>
      val seed = j / 4
      val d = transform(grams, g =>
        md5((if (seed == 0) g else concat(g, lit(seed.toString))).cast("binary")))
      array_min(transform(d, x => substring(x, (j % 4) * 8 + 1, 8))).as(s"b$j")
    }
  }

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaa",           // degenerate: one distinct shingle
    "exactly8!",            // barely above the window size
    "12345678",             // exactly one window
    "héllo wörld — naïve façade über ça",  // multibyte UTF-8
    "日本語のテキストです、これは八文字以上",  // 3-byte code points
    "mixed ascii と 日本語 and ümlauts"
  )

  test("native expression == composed builtins, per slice, incl. multibyte") {
    import spark.implicits._
    val df = samples.toDF("s")
    val native = df.select(
      (0 until 4).map(j =>
        element_at(NgramMinHashMd5.signature(col("s"), 8, 4), j + 1).as(s"a$j")): _*)
    val builtin = df.select(builtinForm(8, 4): _*)
    assert(native.collect().map(_.toSeq) === builtin.collect().map(_.toSeq))
  }

  test("seeded digest family: k=16 == composed builtins, incl. multibyte") {
    import spark.implicits._
    val df = samples.toDF("s")
    val native = df.select(
      (0 until 16).map(j =>
        element_at(NgramMinHashMd5.signature(col("s"), 8, 16), j + 1).as(s"a$j")): _*)
    val builtin = df.select(builtinForm(8, 16): _*)
    assert(native.collect().map(_.toSeq) === builtin.collect().map(_.toSeq))
    // slices from different seeds must be genuinely independent hashes
    val row = native.collect().head.toSeq
    assert(row.distinct.size > 4, s"seeded slices look degenerate: $row")
  }

  /** Composed-builtin statement of the affine family: per window g,
    * base = unsigned 32-bit of md5(g)'s first 8 hex chars, hash j =
    * (aⱼ·(base mod P) + bⱼ) mod P — what the DuckDB oracle computes.
    */
  private def affineBuiltinForm(n: Int, k: Int) = {
    import graft.functions.MinHashUtil
    val p = MinHashUtil.AffineP
    val grams = expr(
      s"transform(sequence(1, length(s) - ${n - 1}), i -> substring(s, i, $n))")
    (0 until k).map { j =>
      val hm = transform(grams, g =>
        conv(substring(md5(g.cast("binary")), 1, 8), 16, 10).cast("long") % p)
      array_min(transform(hm, h =>
        (lit(MinHashUtil.affineA(j)) * h + lit(MinHashUtil.affineB(j))) % p))
        .as(s"b$j")
    }
  }

  test("affine family: native expression == composed builtins, k=64") {
    import graft.functions.NgramMinHashAffine
    import spark.implicits._
    val df = samples.toDF("s")
    val k = 64
    val native = df.select(
      (0 until k).map(j =>
        element_at(NgramMinHashAffine.signature(col("s"), 8, k), j + 1).as(s"a$j")): _*)
    val builtin = df.select(affineBuiltinForm(8, k): _*)
    assert(native.collect().map(_.toSeq) === builtin.collect().map(_.toSeq))
    // permutations of one base hash must still be distinct functions
    val row = native.collect().head.toSeq
    assert(row.distinct.size > 32, s"affine permutations look degenerate: $row")
  }

  test("affine family: interpreted path agrees with codegen, nulls on short input") {
    import graft.functions.NgramMinHashAffine
    import spark.implicits._
    val df = samples.toDF("s")
    val e = NgramMinHashAffine.signature(col("s"), 8, 64)
    val viaCodegen = df.select(e.as("sig")).collect().map(_.getSeq[Long](0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(e.as("sig")).collect().map(_.getSeq[Long](0))
      assert(viaCodegen.map(_.toList).toList === interp.map(_.toList).toList)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val nulls = Seq(Some("1234567"), Some(""), None).toDF("s")
      .select(NgramMinHashAffine.signature(col("s"), 8, 64).as("sig")).collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("affine signature match-rate estimates true shingle Jaccard (k=64)") {
    import graft.functions.NgramMinHashAffine
    import spark.implicits._
    // pairs with controlled overlap: share the first `keep` chars
    val rnd = new scala.util.Random(7)
    def randStr(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val pairs = (0 until 5).map { i =>
      val a = randStr(400)
      val keep = 80 * i
      (a, a.take(keep) + randStr(400 - keep))
    }
    def shingles(s: String) =
      (0 to s.length - 8).map(i => s.substring(i, i + 8)).toSet
    val df = pairs.zipWithIndex
      .flatMap { case ((a, b), i) => Seq((i, "a", a), (i, "b", b)) }
      .toDF("pid", "side", "s")
    val sigs = df.select(col("pid"), col("side"),
        NgramMinHashAffine.signature(col("s"), 8, 64).as("sig")).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getSeq[Long](2)).toMap
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      val (sa, sb) = (shingles(a), shingles(b))
      val trueJ = (sa & sb).size.toDouble / (sa | sb).size
      val est = sigs((i, "a")).zip(sigs((i, "b")))
        .count { case (x, y) => x == y }.toDouble / 64
      // k=64 ⇒ σ = √(J(1−J)/64) ≤ 0.063; 0.2 is a >3σ tolerance
      assert(math.abs(est - trueJ) <= 0.2, s"pair $i: est $est vs true $trueJ")
    }
  }

  test("short and null inputs yield null") {
    import spark.implicits._
    val df = Seq(Some("1234567"), Some(""), None).toDF("s")
    val out = df.select(NgramMinHashMd5.signature(col("s"), 8, 4).as("sig")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("interpreted path agrees with codegen") {
    import spark.implicits._
    val df = samples.toDF("s")
    val expr8 = NgramMinHashMd5.signature(col("s"), 8, 4)
    val viaCodegen = df.select(expr8.as("sig")).collect().map(_.getSeq[String](0))
    // Force the interpreted path for the same rows.
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(expr8.as("sig")).collect().map(_.getSeq[String](0))
      assert(viaCodegen.map(_.toList).toList === interp.map(_.toList).toList)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("window counting is by code point, not byte") {
    import spark.implicits._
    // 7 code points but >8 bytes: must be null (no 8-cp window exists).
    val df = Seq("ééééééé").toDF("s")
    val out = df.select(NgramMinHashMd5.signature(col("s"), 8, 4).as("sig")).collect()
    assert(out.head.isNullAt(0))
  }
}
