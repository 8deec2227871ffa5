package graft

import graft.operators.{BpeTrainer, Dedup, Perceptron, Pq, Similarity}
import graft.streaming.StreamingDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persistent-artifact contract (round-12 verdict item 1): every
  * trained model family round-trips through [[ModelStore]] — save →
  * stamp-validated reload → install into the serving slot — and the
  * RELOADED artifact serves bit-equal to the memoized (just-trained)
  * path. Two layers per family:
  *
  *   1. structural: the reloaded artifact `==` the trained one,
  *      element order included (parquet carries IEEE doubles and
  *      int64s losslessly; the `ord` column freezes Seq order);
  *   2. serving: the flagship consumer query re-collected after
  *      installing the reloaded model equals its pre-install output
  *      row for row.
  *
  * Plus the staleness gate: a load against a dataset whose fingerprint
  * moved (or with different hyperparameters) must THROW, never serve.
  */
class ModelStoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"modelstore-$tag").toString

  private def collected(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("IVF centroids: save -> stamped reload -> bit-equal ann_ivf serving") {
    val trained = Similarity.trainedCentroids(spark, dir)
    val baseline = collected(SparkEntry.queries("ann_ivf")(spark, dir))
    val path = tmp("ivf")
    ModelStore.saveIvf(spark, path, dir, trained)
    val loaded = ModelStore.loadIvf(spark, path, dir)
    assert(loaded === trained, "parquet round-trip must be exact")
    ModelStore.installIvf(dir, loaded)
    // the serving slot now holds the RELOADED object, not the trained one
    assert(Similarity.trainedCentroids(spark, dir) eq
      loaded.asInstanceOf[AnyRef])
    assert(collected(SparkEntry.queries("ann_ivf")(spark, dir)) === baseline)
  }

  test("PQ K=256 codebook: save -> reload -> bit-equal recall serving") {
    val k = Pq.productionCodebookSize
    val trained = Pq.trainedCodebook(spark, dir, k)
    val baseline =
      collected(SparkEntry.queries("ann_pq_recall_k256")(spark, dir))
    val path = tmp("pq")
    ModelStore.savePq(spark, path, dir, k, trained)
    val loaded = ModelStore.loadPq(spark, path, dir, k)
    assert(loaded === trained, "parquet round-trip must be exact")
    ModelStore.installPq(dir, k, loaded)
    assert(Pq.trainedCodebook(spark, dir, k) eq loaded.asInstanceOf[AnyRef])
    assert(collected(SparkEntry.queries("ann_pq_recall_k256")(spark, dir))
      === baseline)
    // wrong hyperparameter: a K=256 artifact must not serve a K=32 ask
    intercept[IllegalArgumentException] {
      ModelStore.loadPq(spark, path, dir, Pq.codebookSize)
    }
  }

  test("OPQ rotation: save -> reload -> bit-equal rotation rows") {
    val trained = graft.operators.Opq.trainedRotation(spark, dir)
    val baseline = collected(SparkEntry.queries("opq_rotation")(spark, dir))
    val path = tmp("opq")
    ModelStore.saveOpq(spark, path, dir, trained)
    val loaded = ModelStore.loadOpq(spark, path, dir)
    // micros are Longs — the round-trip is exact by construction
    assert(loaded.dims === trained.dims)
    assert(loaded.mu === trained.mu)
    assert(loaded.lams === trained.lams)
    assert(loaded.outDimOfRound === trained.outDimOfRound)
    assert(loaded.exact === trained.exact)
    assert((0 until graft.operators.Opq.rotationDims)
      .forall(k => loaded.basis(k).sameElements(trained.basis(k))))
    ModelStore.installOpq(dir, loaded)
    assert(graft.operators.Opq.trainedRotation(spark, dir) eq
      loaded.asInstanceOf[AnyRef])
    assert(collected(SparkEntry.queries("opq_rotation")(spark, dir))
      === baseline)
  }

  test("BPE merges + segmentation: save -> reload -> bit-equal encode") {
    import spark.implicits._
    val merges = BpeTrainer.defaultMerges
    val gate = BpeTrainer.driverTypeLimit
    val trainRows = BpeTrainer.train(spark, dir)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val baseline = collected(SparkEntry.queries("text_bpe_encode")(spark, dir))
    val seg = BpeTrainer.segmentation(spark, dir)
    val path = tmp("bpe")
    ModelStore.saveBpeMerges(spark, path + "/m", dir, merges, gate, trainRows)
    val loadedMerges =
      ModelStore.loadBpeMerges(spark, path + "/m", dir, merges, gate)
    assert(loadedMerges === trainRows, "merge table round-trip must be exact")
    ModelStore.saveBpeSegmentation(spark, path + "/s", dir, merges, gate, seg)
    val loadedSeg =
      ModelStore.loadBpeSegmentation(spark, path + "/s", dir, merges, gate)
    assert(collected(loadedSeg.orderBy("w")) === collected(seg.orderBy("w")),
      "segmentation round-trip must be exact")
    ModelStore.installBpe(spark, dir, merges, gate, loadedMerges, loadedSeg)
    assert(collected(SparkEntry.queries("text_bpe_encode")(spark, dir))
      === baseline)
    // the merge view also serves from the installed rows
    assert(BpeTrainer.train(spark, dir)
      .as[(Long, String, String, String, Long)].collect().toSeq === trainRows)
  }

  test("perceptron weights: save -> reload -> bit-equal classifier") {
    val trained = Perceptron.trainedWeights(spark, dir)
    val baseline =
      collected(SparkEntry.queries("text_quality_classifier")(spark, dir))
    val path = tmp("perceptron")
    ModelStore.savePerceptron(spark, path, dir, trained)
    val loaded = ModelStore.loadPerceptron(spark, path, dir)
    assert(loaded.toSeq === trained.toSeq, "weight round-trip must be exact")
    ModelStore.installPerceptron(dir, loaded)
    assert(Perceptron.trainedWeights(spark, dir) eq
      loaded.asInstanceOf[AnyRef])
    assert(collected(SparkEntry.queries("text_quality_classifier")(spark, dir))
      === baseline)
  }

  test("Bloom bitmap: save -> reload -> bit-equal streaming-gate probe") {
    val (m, words) = Dedup.bloomArtifact(spark, dir)
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val baseline = collected(
      StreamingDedup.maybeDupStream(docs, m, words).orderBy("doc_id"))
    val path = tmp("bloom")
    ModelStore.saveBloom(spark, path, dir, m, words)
    val (m2, words2) = ModelStore.loadBloom(spark, path, dir)
    assert(m2 === m)
    assert(words2.toSeq === words.toSeq, "bitmap round-trip must be exact")
    assert(collected(
      StreamingDedup.maybeDupStream(docs, m2, words2).orderBy("doc_id"))
      === baseline)
    // every CORPUS-SIDE document (doc_id % 10 != 0 — the split the
    // artifact is built from; % 10 == 0 is the probe batch) must probe
    // true: the no-false-negative contract survives persistence
    assert(StreamingDedup.maybeDupStream(docs, m2, words2)
      .filter(col("doc_id") % 10 =!= 0).filter(!col("maybe_dup"))
      .count() === 0L)
  }

  test("Bloom reload serves a LIVE stream identically to the trained artifact") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (m, words) = operators.Dedup.bloomArtifact(spark, dir)
    val path = tmp("bloom-live")
    ModelStore.saveBloom(spark, path, dir, m, words)
    val (mL, wordsL) = ModelStore.loadBloom(spark, path, dir)
    val probeDocs = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    def gateOn(mm: Long, ww: Array[Long], name: String): Map[Long, Boolean] = {
      val in = MemoryStream[(Long, String)]
      val q = StreamingDedup.maybeDupStream(
          in.toDF().toDF("doc_id", "text"), mm, ww)
        .writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      try {
        in.addData(probeDocs: _*)
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      } finally q.stop()
    }
    assert(gateOn(mL, wordsL, "gate_loaded") === gateOn(m, words, "gate_mem"))
  }

  test("DSIR domain model: save -> reload -> bit-equal streaming scores") {
    val trained = operators.Dsir.trainedWeights(spark, dir)
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val baseline = collected(
      operators.Dsir.streamingScores(docs, trained).orderBy("doc_id"))
    val path = tmp("dsir")
    ModelStore.saveDsir(spark, path, dir, trained)
    val loaded = ModelStore.loadDsir(spark, path, dir)
    assert(loaded.toSeq === trained.toSeq, "weight round-trip must be exact")
    assert(collected(
      operators.Dsir.streamingScores(docs, loaded).orderBy("doc_id"))
      === baseline)
  }

  test("anomaly baseline: save -> reload -> bit-equal monitor scores") {
    val trained = operators.Behavior.anomalyBaseline(spark, dir)
      .localCheckpoint(true)
    val events = Tables(spark, dir, "events")
    def scores(b: org.apache.spark.sql.DataFrame) = collected(
      operators.Behavior.streamingAnomalies(events, b)
        .orderBy("event_type", "hour_idx"))
    val baseline = scores(trained)
    val path = tmp("anomaly")
    ModelStore.saveAnomalyBaseline(spark, path, dir, trained)
    val loaded = ModelStore.loadAnomalyBaseline(spark, path, dir)
    assert(collected(loaded.orderBy("event_type")) ===
      collected(trained.orderBy("event_type")),
      "baseline round-trip must be exact")
    assert(scores(loaded) === baseline)
  }

  test("HDR cells: persisted base + fresh delta serves == full recompute") {
    import graft.operators.Sketches
    val path = tmp("hdr")
    // the nightly save: base-slice cells only
    ModelStore.saveHdrCells(spark, path, dir, "base",
      Sketches.hdrCellsOf(spark, dir, Sketches.hdrBaseSide))
    // the increment: reload base (stamp-validated), sketch the delta,
    // merge, read off — must equal the whole-corpus row bit for bit
    assert(collected(Sketches.hdrQuantilesServed(spark, dir, path)) ===
      collected(Sketches.hdrQuantiles(spark, dir)))
    // wrong slice name refuses (it is part of the stamp)
    intercept[IllegalArgumentException] {
      ModelStore.loadHdrCells(spark, path, dir, "delta")
    }
  }

  test("HLL daily regs: persisted base + fresh delta serves == full recompute") {
    import graft.operators.Sketches
    val path = tmp("hll")
    ModelStore.saveHllDailyRegs(spark, path, dir, "base",
      Sketches.hllDailyRegsOf(spark, dir, Sketches.hllBaseSide))
    // reload base (stamp-validated), sketch the delta, MAX-merge (the
    // HLL union), read off — must equal the whole-corpus row bit for bit
    assert(collected(Sketches.hllDailyServed(spark, dir, path)) ===
      collected(Sketches.hllDailyUsers(spark, dir)))
    intercept[IllegalArgumentException] {
      ModelStore.loadHllDailyRegs(spark, path, dir, "delta")
    }
  }

  test("CMS cells: persisted base + fresh delta serves == full recompute") {
    import graft.operators.Sketches
    val path = tmp("cms")
    ModelStore.saveCmsCells(spark, path, dir, "base",
      Sketches.cmsCellsOf(spark, dir, Sketches.cmsBaseSide))
    // reload base (stamp-validated), sketch the delta tokens, keyed
    // sum (cell linearity), read off — bit-equal to the full recompute
    assert(collected(Sketches.cmsTokenCountsServed(spark, dir, path)) ===
      collected(Sketches.cmsTokenCounts(spark, dir)))
    intercept[IllegalArgumentException] {
      ModelStore.loadCmsCells(spark, path, dir, "delta")
    }
  }

  test("overwrite crash contract: old meta never vouches for a new payload") {
    // save() stages the whole new artifact, then commits by deleting
    // the old marker and renaming the staged files in: a retrain whose
    // dataset fingerprint hasn't moved can therefore never leave a
    // valid old meta next to a torn new payload. Simulate the
    // inside-the-commit crash window: after a completed save, delete
    // the meta (the commit's first move) — load must refuse on the
    // missing marker regardless of what the payload dir holds.
    val path = tmp("overwrite")
    ModelStore.savePerceptron(spark, path, dir, Array(1L, 2L, 3L, 4L, 5L, 6L))
    // second save onto the same path succeeds end-to-end (marker is
    // re-created after the new payload swaps in)
    ModelStore.savePerceptron(spark, path, dir, Array(9L, 8L, 7L, 6L, 5L, 4L))
    assert(ModelStore.loadPerceptron(spark, path, dir).toSeq ===
      Seq(9L, 8L, 7L, 6L, 5L, 4L))
    // now the torn overwrite: marker deleted (commit's first move),
    // then the process dies mid-swap — whatever the payload dir holds,
    // load refuses because there is no commit marker
    def rmdir(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmdir))
      f.delete()
    }
    rmdir(new java.io.File(path, "meta.parquet"))
    intercept[Exception] {
      ModelStore.loadPerceptron(spark, path, dir)
    }
  }

  test("durability: a re-save whose payload write throws keeps the prior " +
    "artifact loadable") {
    // the staged-write half of the commit protocol: every byte of the
    // new artifact lands in _staging/ before the commit touches the
    // live files, so a retrain that dies mid-write (OOM, quota, bad
    // input — here: a payload whose evaluation throws) leaves the
    // previously committed artifact fully intact
    import spark.implicits._
    val path = tmp("durable")
    ModelStore.savePerceptron(spark, path, dir, Array(1L, 2L, 3L, 4L, 5L, 6L))
    val boom = udf((_: Long) => {
      throw new RuntimeException("simulated mid-write failure"); 0L
    })
    val poisoned = Seq(1L).toDF("ord")
      .select(col("ord"), boom(col("ord")).as("w"))
    intercept[Exception] {
      ModelStore.save(spark, path,
        ModelStore.Meta("perceptron",
          DataVersion.key(dir, "documents", "perceptron"), ""), poisoned)
    }
    // the failed save destroyed nothing: the v1 artifact still serves
    assert(ModelStore.loadPerceptron(spark, path, dir).toSeq ===
      Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("concurrent reader mid-commit gets the clean refusal, and a " +
    "dangling staging dir never breaks the next save") {
    // single-writer many-reader contract: a reader that lands inside
    // the commit window (marker deleted, staged files not yet renamed
    // in) must see the clean 'no committed artifact' refusal — a
    // require(), not a raw parquet path-not-found — and a staging dir
    // left by a writer that died mid-stage is swept by the next save
    val path = tmp("midcommit")
    ModelStore.savePerceptron(spark, path, dir, Array(1L, 2L, 3L, 4L, 5L, 6L))
    // reproduce the mid-commit state: marker gone, staging populated
    def rmdir(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmdir))
      f.delete()
    }
    val staging = new java.io.File(path, "_staging")
    staging.mkdirs()
    new java.io.File(staging, "payload.parquet").mkdirs()
    rmdir(new java.io.File(path, "meta.parquet"))
    val e = intercept[IllegalArgumentException] {
      ModelStore.loadPerceptron(spark, path, dir)
    }
    assert(e.getMessage.contains("no committed artifact"),
      s"mid-commit reader must get the clean refusal, got: ${e.getMessage}")
    // recovery: a fresh save sweeps the debris and commits normally
    ModelStore.savePerceptron(spark, path, dir, Array(7L, 7L, 7L, 7L, 7L, 7L))
    assert(ModelStore.loadPerceptron(spark, path, dir).toSeq ===
      Seq(7L, 7L, 7L, 7L, 7L, 7L))
    assert(!staging.exists(), "commit must clean up the staging dir")
  }

  test("torn-payload guard: meta row count disagreeing with the payload " +
    "refuses") {
    import spark.implicits._
    val path = tmp("torn")
    ModelStore.savePerceptron(spark, path, dir, Array(1L, 2L, 3L, 4L, 5L, 6L))
    // corrupt: rewrite the payload with fewer rows while keeping the
    // committed meta (simulates a storage-level truncation the commit
    // protocol itself cannot see)
    Seq((0, 1L), (1, 2L)).toDF("ord", "w")
      .write.mode("overwrite").parquet(s"$path/payload.parquet")
    val e = intercept[IllegalArgumentException] {
      ModelStore.loadPerceptron(spark, path, dir)
    }
    assert(e.getMessage.contains("TORN artifact"))
  }

  test("crash contract: a store without its meta commit marker refuses") {
    // save order is payload FIRST, meta LAST — simulate a save that
    // died before the commit marker by deleting meta.parquet: load
    // must fail loudly (no meta = no artifact), never serve the
    // orphaned payload
    val path = tmp("crash")
    ModelStore.savePerceptron(spark, path, dir, Array(1L, 2L, 3L, 4L, 5L, 6L))
    def rmdir(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmdir))
      f.delete()
    }
    rmdir(new java.io.File(path, "meta.parquet"))
    intercept[Exception] {
      ModelStore.loadPerceptron(spark, path, dir)
    }
  }

  test("staleness gate: moved fingerprint and wrong family both refuse") {
    import spark.implicits._
    val path = tmp("stale")
    // stamp an artifact against a COPY of the dataset, then touch the
    // copy: the fingerprint moves, the load must throw
    val copy = tmp("data")
    Tables(spark, dir, "documents").write.parquet(s"$copy/documents.parquet")
    val w = Array(1L, 2L, 3L, 4L, 5L, 6L)
    ModelStore.savePerceptron(spark, path, copy, w)
    assert(ModelStore.loadPerceptron(spark, path, copy).toSeq === w.toSeq)
    // regenerate the table under the same path -> new fingerprint
    // (reads from the ORIGINAL dir so the overwritten path is not
    // simultaneously a read source)
    Tables(spark, dir, "documents").limit(5).write.mode("overwrite")
      .parquet(s"$copy/documents.parquet")
    intercept[IllegalArgumentException] {
      ModelStore.loadPerceptron(spark, path, copy)
    }
    // wrong family: an ivf ask on a perceptron artifact refuses
    intercept[IllegalArgumentException] {
      ModelStore.load(spark, path, "ivf", "whatever", requireFresh = false)
    }
    // deliberate pinned-model serve: requireFresh=false loads anyway
    val (meta, payload) = ModelStore.load(spark, path, "perceptron",
      "ignored", requireFresh = false)
    assert(meta.family === "perceptron")
    assert(payload.orderBy("ord").select("w").as[Long].collect().toSeq
      === w.toSeq)
  }
}
