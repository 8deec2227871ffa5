package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a ×FACTOR corpus from an existing testdata directory —
  * the scale-rehearsal fixture (round-15 mandate): every 100 TB claim
  * rests on design discipline plus the sf0.01→sf0.1 slope audit, and
  * this generator buys the NEXT decade locally so an unbounded-state
  * mistake surfaces here, not on a user's first scale-up.
  *
  * Replication scheme ("same distributions", organic growth — not
  * verbatim copies, which would inflate duplicate-pair density
  * quadratically and mis-shape the dedup rows):
  *
  *  - every fact table gets FACTOR replicas; replica k shifts each
  *    entity id by k·10⁹ (a stride divisible by 2/5/10/25/100, so all
  *    the engine's deterministic mod-class samplers keep their
  *    sampling fraction at scale);
  *  - `documents.text` replica k>0 passes through a per-replica
  *    letter SUBSTITUTION CIPHER (alphabet rotated by k, spaces
  *    fixed) — a bijection on characters preserves every word length,
  *    every shingle-set size, and every pairwise overlap EXACTLY, so
  *    the within-replica near-duplicate structure is an isomorphic
  *    image of the base corpus (hash randomness re-rolled, structure
  *    identical) while cross-replica similarity is zero: truth pairs
  *    scale linearly ×FACTOR, the way an organically larger crawl's
  *    would. (A word-suffix transform was measured to INFLATE
  *    within-replica similarity ~1000× — longer words shift the
  *    char-shingle population toward shared intra-word shingles —
  *    which is why a length-preserving bijection is the only safe
  *    text transform here.);
  *  - `customer.c_name` replica k>0 appends a 4-char tag whose
  *    pairwise edit distance across replicas is ≥ 3 (> the fuzzy-join
  *    lev ≤ 2 threshold), so name-dup groups also replicate without
  *    cross-replica explosion;
  *  - `embeddings.embedding` replica k rotates the dimension order by
  *    k — norms and per-dim marginals are preserved, replicas are
  *    mutually decorrelated (no artificial exact-tie ANN neighbors);
  *  - dimension tables (region, nation, part, supplier) stay fixed —
  *    the catalog does not grow with order volume (the TPC-H shape),
  *    so per-part/supplier fan-in grows ×FACTOR, which is exactly the
  *    skew direction a scale rehearsal should stress;
  *  - timestamps and dates are untouched: the calendar doesn't grow
  *    with the business, per-day density does.
  */
object ScaleGen {

  /** Id stride between replicas — divisible by every modulus the
    * engine samples on (2, 5, 10, 25, 100), so mod-class samplers see
    * the same fraction at every scale.
    */
  val stride = 1000000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/root/repo/scale10"
    val factor = if (args.length > 2) args(2).toInt else 10
    // 25 letter tags (k = 1..25) + the untagged base replica; also
    // 26 cipher rotations and 64 embedding rotations stay distinct
    require(factor >= 1 && factor <= 26,
      s"factor must be in [1, 26] (letter-tag alphabet bound), got $factor")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.coalesce(8).write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")

    def shifted(c: String, k: Int) = col(c) + lit(k * stride)

    // dimension tables: fixed catalog
    Seq("region", "nation", "part", "supplier").foreach(t => write(read(t), t))

    def replicate(t: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(t)
      write((0 until factor).map(k => f(base, k)).reduce(_ unionByName _), t)
    }

    replicate("customer") { (df, k) =>
      df.select(shifted("c_custkey", k).as("c_custkey"),
        // 4-char replica tag: one per-replica LETTER repeated ×3 — any
        // two distinct replicas differ in all 3 tag positions (lev
        // exactly 3; digit tags like "121212"/"212121" are cyclic
        // shifts at lev 2 for factor ≥ 22) and ≥ 4 vs the untagged
        // base, both beyond the fuzzy join's lev ≤ 2, so name-dup
        // groups replicate without cross-replica pairs. 25 letters
        // bound the factor — enforced loudly at entry.
        (if (k == 0) col("c_name")
         else concat(col("c_name"),
           lit(" " + ('a' + k - 1).toChar.toString * 3))).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }

    replicate("orders") { (df, k) =>
      df.select(shifted("o_orderkey", k).as("o_orderkey"),
        shifted("o_custkey", k).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }

    replicate("lineitem") { (df, k) =>
      // part/supplier keys stay in the fixed catalog's key space
      df.withColumn("l_orderkey", shifted("l_orderkey", k))
    }

    replicate("events") { (df, k) =>
      df.withColumn("event_id", shifted("event_id", k))
        .withColumn("user_id", shifted("user_id", k))
    }

    replicate("documents") { (df, k) =>
      val alphabet = "abcdefghijklmnopqrstuvwxyz"
      val rotated = alphabet.drop(k % 26) + alphabet.take(k % 26)
      val txt =
        if (k == 0) col("text")
        // per-replica substitution cipher: length-preserving bijection
        // ⇒ shingle structure isomorphic within a replica, disjoint
        // across replicas
        else translate(col("text"), alphabet, rotated)
      df.select(shifted("doc_id", k).as("doc_id"), txt.as("text"),
          col("lang"), col("source"), col("n_chars"))
    }

    replicate("embeddings") { (df, k) =>
      val d = 64
      val rot = k % d
      val emb =
        if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, d - rot),
          slice(col("embedding"), 1, rot))
      df.select(shifted("vec_id", k).as("vec_id"), emb.as("embedding"),
        col("label"))
    }

    println(s"[scalegen] wrote ${out} at factor ${factor} from ${src}")
    spark.stop()
  }
}
