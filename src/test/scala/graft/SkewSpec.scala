package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted-join correctness: identical result set to the plain inner
  * join on a skewed input, and the salt actually spreads the hot key.
  */
class SkewSpec extends SparkSpec {

  test("saltedJoin equals plain join on a hot-key distribution") {
    import spark.implicits._
    // 900 rows on one hot key + 100 spread over 10 keys
    val big = ((1 to 900).map(i => (1L, s"v$i")) ++
      (1 to 100).map(i => (1L + i % 10 + 1, s"w$i"))).toDF("k", "payload")
    val small = (1 to 12).map(i => (i.toLong, s"dim$i")).toDF("k", "name")

    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedJoin(big, small, "k", saltBuckets = 8)
      .select("k", "payload", "name")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted === plain)
  }

  test("salt is deterministic and spreads the hot key over buckets") {
    import spark.implicits._
    val big = (1 to 1000).map(i => (1L, s"v$i")).toDF("k", "payload")
    val salts = big.withColumn("__salt", pmod(hash(big.columns.map(col): _*), lit(8)))
      .groupBy("__salt").count().collect()
    assert(salts.length > 4) // hot key split across most buckets
    // deterministic: recomputing yields identical assignment
    val again = big.withColumn("__salt", pmod(hash(big.columns.map(col): _*), lit(8)))
      .groupBy("__salt").count().collect()
    assert(salts.map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq ===
      again.map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq)
  }
}
