package graft.examples

import graft.{ModelStore, SparkEntry, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end persistent-artifact lifecycle — the train → save →
  * reload → install → serve loop a production deployment runs across
  * process restarts, over every trained family the engine serves:
  * IVF centroids, PQ K=256 codebook, BPE merges + segmentation,
  * perceptron weights, Bloom bitmap, DSIR domain model, anomaly
  * baseline. Each line reports the round-trip (structural equality)
  * and a reloaded-serving parity check against the in-memory path —
  * the bit-equal contract ModelStoreSpec pins per family.
  *
  *   sbt "runMain graft.examples.StoreDemo [storeDir [dataDir]]"
  */
object StoreDemo {

  def main(args: Array[String]): Unit = {
    val store = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-store").toString)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Behavior, BpeTrainer, Dedup, Dsir, Perceptron, Pq, Similarity}
    import spark.implicits._

    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq

    // IVF
    val ivf = Similarity.trainedCentroids(spark, dir)
    val ivfBase = rows(SparkEntry.queries("ann_ivf")(spark, dir))
    ModelStore.saveIvf(spark, s"$store/ivf", dir, ivf)
    val ivfL = ModelStore.loadIvf(spark, s"$store/ivf", dir)
    ModelStore.installIvf(dir, ivfL)
    println(s"[demo] ivf: ${ivfL.length} centroids round-trip=" +
      s"${ivfL == ivf} serve-parity=" +
      s"${rows(SparkEntry.queries("ann_ivf")(spark, dir)) == ivfBase}")

    // PQ K=256
    val k = Pq.productionCodebookSize
    val pq = Pq.trainedCodebook(spark, dir, k)
    ModelStore.savePq(spark, s"$store/pq", dir, k, pq)
    val pqL = ModelStore.loadPq(spark, s"$store/pq", dir, k)
    ModelStore.installPq(dir, k, pqL)
    println(s"[demo] pq: K=$k ${pqL.length} codewords round-trip=${pqL == pq}")

    // OPQ rotation (exact-integer micros — round-trip exact by
    // construction; the regime flag rides along)
    val opq = graft.operators.Opq.trainedRotation(spark, dir)
    val opqBase = rows(SparkEntry.queries("opq_rotation")(spark, dir))
    ModelStore.saveOpq(spark, s"$store/opq", dir, opq)
    val opqL = ModelStore.loadOpq(spark, s"$store/opq", dir)
    ModelStore.installOpq(dir, opqL)
    println(s"[demo] opq: ${opqL.dims.length}-dim rotation " +
      s"regime=${if (opqL.exact) "closed-form" else "iterative"} " +
      s"round-trip=${opqL.lams.sameElements(opq.lams)} serve-parity=" +
      s"${rows(SparkEntry.queries("opq_rotation")(spark, dir)) == opqBase}")

    // BPE
    val merges = BpeTrainer.defaultMerges
    val gate = BpeTrainer.driverTypeLimit
    val mergeRows = BpeTrainer.train(spark, dir)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val encBase = rows(SparkEntry.queries("text_bpe_encode")(spark, dir))
    val seg = BpeTrainer.segmentation(spark, dir)
    ModelStore.saveBpeMerges(spark, s"$store/bpe-m", dir, merges, gate, mergeRows)
    ModelStore.saveBpeSegmentation(spark, s"$store/bpe-s", dir, merges, gate, seg)
    val mergesL = ModelStore.loadBpeMerges(spark, s"$store/bpe-m", dir, merges, gate)
    val segL = ModelStore.loadBpeSegmentation(spark, s"$store/bpe-s", dir, merges, gate)
    ModelStore.installBpe(spark, dir, merges, gate, mergesL, segL)
    println(s"[demo] bpe: ${mergesL.length} merges round-trip=" +
      s"${mergesL == mergeRows} encode-parity=" +
      s"${rows(SparkEntry.queries("text_bpe_encode")(spark, dir)) == encBase}")

    // Perceptron
    val w = Perceptron.trainedWeights(spark, dir)
    ModelStore.savePerceptron(spark, s"$store/perceptron", dir, w)
    val wL = ModelStore.loadPerceptron(spark, s"$store/perceptron", dir)
    ModelStore.installPerceptron(dir, wL)
    println(s"[demo] perceptron: ${wL.length} weights round-trip=" +
      s"${wL.toSeq == w.toSeq}")

    // Bloom
    val (m, words) = Dedup.bloomArtifact(spark, dir)
    ModelStore.saveBloom(spark, s"$store/bloom", dir, m, words)
    val (mL, wordsL) = ModelStore.loadBloom(spark, s"$store/bloom", dir)
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val gateParity =
      rows(graft.streaming.StreamingDedup.maybeDupStream(docs, mL, wordsL)
        .orderBy("doc_id")) ==
      rows(graft.streaming.StreamingDedup.maybeDupStream(docs, m, words)
        .orderBy("doc_id"))
    println(s"[demo] bloom: m=$mL ${wordsL.length} words round-trip=" +
      s"${mL == m && wordsL.toSeq == words.toSeq} gate-parity=$gateParity")

    // DSIR
    val dsir = Dsir.trainedWeights(spark, dir)
    ModelStore.saveDsir(spark, s"$store/dsir", dir, dsir)
    val dsirL = ModelStore.loadDsir(spark, s"$store/dsir", dir)
    val dsirParity = rows(Dsir.streamingScores(docs, dsirL).orderBy("doc_id")) ==
      rows(Dsir.streamingScores(docs, dsir).orderBy("doc_id"))
    println(s"[demo] dsir: ${dsirL.count(_ != 0L)} live buckets round-trip=" +
      s"${dsirL.toSeq == dsir.toSeq} score-parity=$dsirParity")

    // Anomaly baseline
    val base = Behavior.anomalyBaseline(spark, dir).localCheckpoint(true)
    ModelStore.saveAnomalyBaseline(spark, s"$store/anomaly", dir, base)
    val baseL = ModelStore.loadAnomalyBaseline(spark, s"$store/anomaly", dir)
    val events = Tables(spark, dir, "events")
    val monParity =
      rows(Behavior.streamingAnomalies(events, baseL)
        .orderBy("event_type", "hour_idx")) ==
      rows(Behavior.streamingAnomalies(events, base)
        .orderBy("event_type", "hour_idx"))
    println(s"[demo] anomaly: ${baseL.count()} type baselines " +
      s"monitor-parity=$monParity")

    // HDR sketch cells: persisted nightly base + fresh delta slice
    import graft.operators.Sketches
    ModelStore.saveHdrCells(spark, s"$store/hdr", dir, "base",
      Sketches.hdrCellsOf(spark, dir, Sketches.hdrBaseSide))
    val hdrParity =
      rows(Sketches.hdrQuantilesServed(spark, dir, s"$store/hdr")) ==
      rows(Sketches.hdrQuantiles(spark, dir))
    println(s"[demo] hdr-cells: store-served base+delta == full recompute: " +
      s"$hdrParity")

    // HLL daily registers: persisted base MAX-merged with the delta
    ModelStore.saveHllDailyRegs(spark, s"$store/hll", dir, "base",
      Sketches.hllDailyRegsOf(spark, dir, Sketches.hllBaseSide))
    val hllParity =
      rows(Sketches.hllDailyServed(spark, dir, s"$store/hll")) ==
      rows(Sketches.hllDailyUsers(spark, dir))
    println(s"[demo] hll-regs: store-served base+delta == full recompute: " +
      s"$hllParity")

    // CMS cells: persisted base summed keyed with the delta batch
    ModelStore.saveCmsCells(spark, s"$store/cms", dir, "base",
      Sketches.cmsCellsOf(spark, dir, Sketches.cmsBaseSide))
    val cmsParity =
      rows(Sketches.cmsTokenCountsServed(spark, dir, s"$store/cms")) ==
      rows(Sketches.cmsTokenCounts(spark, dir))
    println(s"[demo] cms-cells: store-served base+delta == full recompute: " +
      s"$cmsParity")

    // staleness: the stamp refuses an artifact for a different dataset
    val refused =
      try { ModelStore.loadIvf(spark, s"$store/ivf", "/root/testdata/sf0.01"); false }
      catch { case _: IllegalArgumentException => true }
    println(s"[demo] staleness gate refuses a foreign dataset: $refused")

    spark.stop()
  }
}
