package graft

import graft.operators.Manifest
import org.apache.spark.sql.functions._

/** Properties of the content-addressed dataset manifest: layout/order
  * insensitivity (same logical content ⇒ same checksum), tamper
  * sensitivity (one changed field ⇒ different checksum), and count
  * agreement with the raw tables.
  */
class ManifestSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val docFields = Manifest.spec.toMap.apply("documents")

  test("manifest counts match the tables; all ten rows present") {
    val m = Manifest.datasetManifest(spark, dir).collect()
    assert(m.map(_.getString(0)).toSeq === Manifest.spec.map(_._1).sorted)
    m.foreach { r =>
      assert(r.getAs[Long]("n_rows") ===
        Tables(spark, dir, r.getString(0)).count(), r.getString(0))
    }
  }

  test("checksum is invariant to row order and partitioning") {
    val base = Tables(spark, dir, "documents")
    val a = Manifest.manifestOf(base, "documents", docFields).collect().head
    val shuffled = base.orderBy(md5(col("text").cast("binary")))
      .repartition(13)
    val b = Manifest.manifestOf(shuffled, "documents", docFields)
      .collect().head
    assert(a.getAs[Long]("checksum") === b.getAs[Long]("checksum"))
    assert(a.getAs[Long]("n_rows") === b.getAs[Long]("n_rows"))
  }

  test("one tampered field flips the checksum; a dropped row flips it too") {
    val base = Tables(spark, dir, "documents")
    val clean = Manifest.manifestOf(base, "documents", docFields)
      .collect().head.getAs[Long]("checksum")
    val tampered = base.withColumn("lang",
      when(col("doc_id") === 0L, lit("xx")).otherwise(col("lang")))
    val t = Manifest.manifestOf(tampered, "documents", docFields)
      .collect().head.getAs[Long]("checksum")
    assert(t !== clean)
    val dropped = Manifest.manifestOf(base.filter(col("doc_id") =!= 0L),
      "documents", docFields).collect().head
    assert(dropped.getAs[Long]("checksum") !== clean)
  }

  test("embedding vectors are content-hashed: a permuted vector changes it") {
    val base = Tables(spark, dir, "embeddings")
    val fields = Manifest.spec.toMap.apply("embeddings")
    val clean = Manifest.manifestOf(base, "embeddings", fields)
      .collect().head.getAs[Long]("checksum")
    val permuted = base.withColumn("embedding",
      when(col("vec_id") === 0L, reverse(col("embedding")))
        .otherwise(col("embedding")))
    val p = Manifest.manifestOf(permuted, "embeddings", fields)
      .collect().head.getAs[Long]("checksum")
    assert(p !== clean, "positional weighting must detect a permutation")
  }
}
