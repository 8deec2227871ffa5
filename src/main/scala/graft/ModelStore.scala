package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent trained-artifact store: every model the engine trains
  * (IVF centroids, PQ codebooks, BPE merge table + segmentation,
  * perceptron weights, Bloom bitmap) can be saved to a parquet
  * directory stamped with its [[DataVersion]] and reloaded into the
  * exact serving slot it came from — the production contract the
  * session-local memo caches only approximate (a real pipeline trains
  * once, persists, and serves every later job from reloaded state;
  * the reference's analog is its persisted connector configs,
  * `/root/reference/connectors/debezium_configuration.json:1-53`).
  *
  * Layout (all Spark-native parquet, so artifacts live on the same
  * lake/filesystem as the data at any scale):
  *
  *   <path>/meta.parquet     one row: family, data_version, params
  *   <path>/payload.parquet  the model rows, with an explicit `ord`
  *                           column where the artifact is an ordered
  *                           Seq — reload returns EXACTLY the saved
  *                           sequence, element order included
  *
  * Exactness: parquet stores IEEE doubles and int64s losslessly, so a
  * reloaded artifact is structurally EQUAL to the saved one (the
  * round-trip specs assert `==`, not approximate closeness) and
  * serving from it is bit-equal to serving from the in-memory
  * original.
  *
  * Staleness: [[load]] re-fingerprints the CURRENT dataset directory
  * and refuses an artifact whose stamp disagrees — the same
  * regenerated-data contract the memo caches get from
  * [[DataVersion.key]], now enforced across process restarts. Callers
  * that want to serve anyway (e.g. a pinned model over a moving
  * corpus) can pass `requireFresh = false` and get the stamp back to
  * decide themselves.
  */
object ModelStore {

  /** What a stored artifact says about itself. `dataVersion` is the
    * [[DataVersion.key]] of the training input at save time; `params`
    * is the family's free-form hyperparameter string (k, merge
    * budget, …) so a load can refuse a model trained at different
    * settings; `rows` is the payload row count at save time, re-counted
    * and verified at [[load]] so a torn payload can never serve even if
    * a commit marker somehow survives next to it.
    */
  final case class Meta(family: String, dataVersion: String, params: String,
                        rows: Long = -1L)

  def save(spark: SparkSession, path: String, meta: Meta,
           payload: DataFrame): Unit = {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    // Staged write + rename commit. The whole new artifact (payload +
    // meta) lands under `_staging/` first, so a save that dies anywhere
    // during the writes leaves the PRIOR artifact untouched and
    // loadable — a failed retrain must never destroy the good model.
    // The commit phase is then three metadata-only filesystem moves:
    //   1. delete the live meta (the commit marker — from this instant
    //      the store reads as "no committed artifact", a clean refusal,
    //      never a torn old/new mix),
    //   2. swap the payload directory in by rename,
    //   3. rename the new meta into place (re-arming the marker).
    // All moves go through the Hadoop FileSystem the parquet writes
    // use, so the contract holds on every store the writes reach
    // (file://, hdfs://, s3a://) — java.io.File would silently no-op
    // off the local filesystem. Writer concurrency is out of scope:
    // the store contract is single-writer, many-reader (a reader that
    // lands inside the ~ms commit window gets the clean "no committed
    // artifact" refusal from [[load]] and retries).
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(root, "_staging")
    fs.delete(staging, true) // debris from a save that died mid-stage
    val nRows = payload.count()
    payload.write.mode("overwrite")
      .parquet(s"$path/_staging/payload.parquet")
    Seq((meta.family, meta.dataVersion, meta.params, nRows))
      .toDF("family", "data_version", "params", "n_rows")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_staging/meta.parquet")
    fs.delete(new Path(root, "meta.parquet"), true)
    fs.delete(new Path(root, "payload.parquet"), true)
    require(fs.rename(new Path(staging, "payload.parquet"),
      new Path(root, "payload.parquet")),
      s"commit failed: could not move staged payload into $path")
    require(fs.rename(new Path(staging, "meta.parquet"),
      new Path(root, "meta.parquet")),
      s"commit failed: could not move staged meta into $path")
    fs.delete(staging, true)
  }

  /** Load an artifact's payload after validating the stamp: the
    * family must match, and (with `requireFresh`) the stored
    * data-version stamp must equal `expectedVersion` — pass the
    * freshly recomputed [[DataVersion.key]] of the dataset the model
    * will serve, so a stale or foreign artifact fails LOUDLY at load,
    * never silently at query time.
    */
  def load(spark: SparkSession, path: String, family: String,
           expectedVersion: String, expectedParams: Option[String] = None,
           requireFresh: Boolean = true): (Meta, DataFrame) = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta.parquet")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // absent marker = never saved, a save that died before commit, or a
    // writer inside the commit window — one clean refusal for all three
    require(fs.exists(metaPath),
      s"no committed artifact at $path (never saved, a save died before " +
        "its commit marker, or a writer is mid-commit) — retrain, or " +
        "retry if a writer is known to be live")
    val m = spark.read.parquet(s"$path/meta.parquet").head()
    val meta = Meta(m.getAs[String]("family"),
      m.getAs[String]("data_version"), m.getAs[String]("params"),
      m.getAs[Long]("n_rows"))
    require(meta.family == family,
      s"artifact at $path is family '${meta.family}', expected '$family'")
    expectedParams.foreach(p => require(meta.params == p,
      s"artifact at $path trained with params '${meta.params}', " +
        s"expected '$p'"))
    if (requireFresh)
      require(meta.dataVersion == expectedVersion,
        s"STALE artifact at $path: stamped '${meta.dataVersion}', the " +
          s"dataset now fingerprints '$expectedVersion' — retrain or pass " +
          "requireFresh = false to serve a pinned model deliberately")
    val payload = spark.read.parquet(s"$path/payload.parquet")
    val got = payload.count()
    require(got == meta.rows,
      s"TORN artifact at $path: meta records ${meta.rows} payload rows, " +
        s"the payload directory holds $got — refuse and retrain")
    (meta, payload)
  }

  // ---- IVF centroids --------------------------------------------------

  def saveIvf(spark: SparkSession, path: String, dir: String,
              centroids: Seq[(Long, Seq[Double])]): Unit = {
    import spark.implicits._
    save(spark, path,
      Meta("ivf", DataVersion.key(dir, "embeddings", "ivf"), ""),
      centroids.zipWithIndex
        .map { case ((cid, c), i) => (i, cid, c) }
        .toDF("ord", "c_id", "c_emb"))
  }

  /** Reload the centroid artifact (stamp-validated against the
    * CURRENT `dir`) in exactly the saved order.
    */
  def loadIvf(spark: SparkSession, path: String,
              dir: String): Seq[(Long, Seq[Double])] = {
    import spark.implicits._
    load(spark, path, "ivf", DataVersion.key(dir, "embeddings", "ivf"))._2
      .orderBy("ord").select("c_id", "c_emb")
      .as[(Long, Seq[Double])].collect().toSeq
  }

  /** Install a reloaded centroid model into the serving slot
    * ([[operators.Similarity]]'s memo) so every IVF consumer
    * (`ann_ivf`, recall audits, the streaming scorer) serves from the
    * store-loaded artifact.
    */
  def installIvf(dir: String, model: Seq[(Long, Seq[Double])]): Unit =
    operators.Similarity.installCentroids(dir, model)

  // ---- PQ codebook ----------------------------------------------------

  def savePq(spark: SparkSession, path: String, dir: String, k: Int,
             codebook: Seq[(Int, Long, Seq[Double])]): Unit = {
    import spark.implicits._
    save(spark, path,
      Meta("pq", DataVersion.key(dir, "embeddings", s"pq$k"), s"k=$k"),
      codebook.zipWithIndex
        .map { case ((m, cid, c), i) => (i, m, cid, c) }
        .toDF("ord", "m", "c_id", "c_emb"))
  }

  def loadPq(spark: SparkSession, path: String, dir: String,
             k: Int): Seq[(Int, Long, Seq[Double])] = {
    import spark.implicits._
    load(spark, path, "pq", DataVersion.key(dir, "embeddings", s"pq$k"),
      Some(s"k=$k"))._2
      .orderBy("ord").select("m", "c_id", "c_emb")
      .as[(Int, Long, Seq[Double])].collect().toSeq
  }

  def installPq(dir: String, k: Int,
                model: Seq[(Int, Long, Seq[Double])]): Unit =
    operators.Pq.installCodebook(dir, k, model)

  // ---- BPE merges + segmentation --------------------------------------

  def saveBpeMerges(spark: SparkSession, path: String, dir: String,
                    merges: Int, smallTypeLimit: Long,
                    rows: Seq[(Long, String, String, String, Long)]): Unit = {
    import spark.implicits._
    save(spark, path,
      Meta("bpe_merges", DataVersion.key(dir, "documents", "bpe"),
        s"merges=$merges#gate=$smallTypeLimit"),
      rows.toDF("rank", "left", "right", "merged", "n"))
  }

  def loadBpeMerges(spark: SparkSession, path: String, dir: String,
                    merges: Int, smallTypeLimit: Long
                   ): Seq[(Long, String, String, String, Long)] = {
    import spark.implicits._
    load(spark, path, "bpe_merges", DataVersion.key(dir, "documents", "bpe"),
      Some(s"merges=$merges#gate=$smallTypeLimit"))._2
      .orderBy("rank")
      .as[(Long, String, String, String, Long)].collect().toSeq
  }

  /** The segmentation artifact is a word-type table (w → subword
    * array), keyed not ordered — saved as-is; consumers join on `w`.
    */
  def saveBpeSegmentation(spark: SparkSession, path: String, dir: String,
                          merges: Int, smallTypeLimit: Long,
                          seg: DataFrame): Unit =
    save(spark, path,
      Meta("bpe_seg", DataVersion.key(dir, "documents", "bpe"),
        s"merges=$merges#gate=$smallTypeLimit"),
      seg.select("w", "sub"))

  def loadBpeSegmentation(spark: SparkSession, path: String, dir: String,
                          merges: Int, smallTypeLimit: Long): DataFrame =
    load(spark, path, "bpe_seg", DataVersion.key(dir, "documents", "bpe"),
      Some(s"merges=$merges#gate=$smallTypeLimit"))._2

  def installBpe(spark: SparkSession, dir: String, merges: Int,
                 smallTypeLimit: Long,
                 trainRows: Seq[(Long, String, String, String, Long)],
                 seg: DataFrame): Unit =
    operators.BpeTrainer.installModel(spark, dir, merges, smallTypeLimit,
      trainRows, seg)

  // ---- Perceptron weights ----------------------------------------------

  def savePerceptron(spark: SparkSession, path: String, dir: String,
                     w: Array[Long]): Unit = {
    import spark.implicits._
    save(spark, path,
      Meta("perceptron", DataVersion.key(dir, "documents", "perceptron"), ""),
      w.toSeq.zipWithIndex.map { case (v, i) => (i, v) }.toDF("ord", "w"))
  }

  def loadPerceptron(spark: SparkSession, path: String,
                     dir: String): Array[Long] = {
    import spark.implicits._
    load(spark, path, "perceptron",
      DataVersion.key(dir, "documents", "perceptron"))._2
      .orderBy("ord").select("w").as[Long].collect()
  }

  def installPerceptron(dir: String, w: Array[Long]): Unit =
    operators.Perceptron.installWeights(dir, w)

  // ---- DSIR domain model ------------------------------------------------

  /** The hashed-n-gram domain model (dense per-bucket scaled
    * log-ratios) that [[operators.Dsir.streamingScores]] serves —
    * saved like the perceptron (ord, w).
    */
  def saveDsir(spark: SparkSession, path: String, dir: String,
               w: Array[Long]): Unit = {
    import spark.implicits._
    save(spark, path,
      Meta("dsir", DataVersion.key(dir, "documents", "dsir"),
        s"buckets=${w.length}"),
      w.toSeq.zipWithIndex.map { case (v, i) => (i, v) }.toDF("ord", "w"))
  }

  def loadDsir(spark: SparkSession, path: String, dir: String): Array[Long] = {
    import spark.implicits._
    load(spark, path, "dsir", DataVersion.key(dir, "documents", "dsir"))._2
      .orderBy("ord").select("w").as[Long].collect()
  }

  // ---- OPQ rotation ---------------------------------------------------

  /** The OPQ rotation artifact ([[operators.Opq.Rotation]]) as one
    * exact-integer row table: (round k × observed slot) carrying the
    * basis weight and eigenvalue in MICROS plus the per-slot mean and
    * the regime flag — micros are Longs, so the round-trip is
    * bit-exact by construction (no float serialization concerns at
    * all, the dividend of the integer training discipline).
    */
  def saveOpq(spark: SparkSession, path: String, dir: String,
              rot: operators.Opq.Rotation): Unit = {
    import spark.implicits._
    val rows = for {
      k <- 0 until operators.Opq.rotationDims
      s <- rot.dims.indices
    } yield (k.toLong * rot.dims.length + s, k, rot.outDimOfRound(k),
      rot.dims(s), rot.mu(s), rot.basis(k)(s), rot.lams(k), rot.exact)
    save(spark, path,
      Meta("opq", DataVersion.key(dir, "embeddings", "opqrot"), ""),
      rows.toDF("ord", "k", "out_dim", "in_dim", "mu", "w", "lam", "exact"))
  }

  def loadOpq(spark: SparkSession, path: String,
              dir: String): operators.Opq.Rotation = {
    import spark.implicits._
    val rows = load(spark, path, "opq",
      DataVersion.key(dir, "embeddings", "opqrot"))._2
      .orderBy("ord")
      .select("k", "out_dim", "in_dim", "mu", "w", "lam", "exact")
      .as[(Int, Int, Int, Double, Long, Long, Boolean)].collect()
    val dims = rows.filter(_._1 == 0).map(_._3).sorted
    val slot = dims.zipWithIndex.toMap
    val dd = operators.Opq.rotationDims
    val mu = new Array[Double](dims.length)
    val basis = Array.ofDim[Long](dd, dims.length)
    val lams = new Array[Long](dd)
    val outDim = new Array[Int](dd)
    rows.foreach { case (k, o, i, m, w, l, _) =>
      val s = slot(i)
      mu(s) = m; basis(k)(s) = w; lams(k) = l; outDim(k) = o
    }
    operators.Opq.Rotation(dims, mu, basis, lams, outDim,
      rows.headOption.forall(_._7))
  }

  /** Install a reloaded rotation into the serving slot so every OPQ
    * consumer (`opq_rotation`, `ann_opq_recall`) serves from the
    * store-loaded artifact.
    */
  def installOpq(dir: String, model: operators.Opq.Rotation): Unit =
    operators.Opq.installRotation(dir, model)

  // ---- Anomaly baseline ---------------------------------------------------

  /** The frozen per-event-type hourly baseline (b_cnt, b_sum, b_ss —
    * exact integers) that [[operators.Behavior.streamingAnomalies]]
    * scores against; keyed by event_type, saved as-is.
    */
  def saveAnomalyBaseline(spark: SparkSession, path: String, dir: String,
                          baseline: DataFrame): Unit =
    save(spark, path,
      Meta("anomaly_baseline", DataVersion.key(dir, "events", "anomaly"), ""),
      baseline.select("event_type", "b_cnt", "b_sum", "b_ss"))

  def loadAnomalyBaseline(spark: SparkSession, path: String,
                          dir: String): DataFrame =
    load(spark, path, "anomaly_baseline",
      DataVersion.key(dir, "events", "anomaly"))._2

  // ---- HDR sketch cells ---------------------------------------------------

  /** The HDR quantile sketch's cell table (e, sub, key, n — exact
    * integers) — SKETCH state rather than model weights, but the same
    * persistence contract: the nightly job saves its cells, the next
    * increment reloads them and merges the day's delta by keyed sum
    * ([[operators.Sketches.hdrQuantilesServed]]); linearity makes the
    * served read-off bit-equal to a full recompute.
    *
    * Stamp semantics (stated precisely, because sketch state differs
    * from model state here): the stamp pins the source-table VERSION
    * the base was sketched from, so on this round's immutable test
    * tables a fresh load proves the data did not move under the
    * sketch. In a production lake, base and delta are separate
    * partition directories — each slice fingerprints independently
    * and new delta arrival does NOT touch the base slice's stamp; a
    * deployment whose "table" is one growing directory instead keeps
    * its own slice watermark and loads the base with
    * `requireFresh = false` — the stamp then records provenance
    * rather than gating it, which is the honest best available when
    * the store cannot see slice boundaries.
    */
  def saveHdrCells(spark: SparkSession, path: String, dir: String,
                   slice: String, cells: DataFrame): Unit =
    save(spark, path,
      Meta("hdr_cells", DataVersion.key(dir, "orders", s"hdr#$slice"),
        s"subBits=${operators.Sketches.hdrSubBits}"),
      cells.select("e", "sub", "key", "n"))

  def loadHdrCells(spark: SparkSession, path: String, dir: String,
                   slice: String): DataFrame =
    load(spark, path, "hdr_cells",
      DataVersion.key(dir, "orders", s"hdr#$slice"),
      Some(s"subBits=${operators.Sketches.hdrSubBits}"))._2

  // ---- HLL daily registers ------------------------------------------------

  /** The grouped HLL sketch's register table (day, reg, max_rho —
    * exact integers), the distinct-count sibling of [[saveHdrCells]]:
    * the nightly job saves its per-day registers, the next increment
    * reloads them and MAX-merges the day's delta (the HLL union —
    * [[operators.Sketches.hllDailyServed]]); the union property makes
    * the served read-off bit-equal to a full recompute. Same slice-
    * stamp semantics as the HDR cells (see [[saveHdrCells]]).
    */
  def saveHllDailyRegs(spark: SparkSession, path: String, dir: String,
                       slice: String, regs: DataFrame): Unit =
    save(spark, path,
      Meta("hll_daily_regs", DataVersion.key(dir, "events", s"hll#$slice"),
        s"m=${operators.Sketches.hllRegisters}"),
      regs.select("day", "reg", "max_rho"))

  def loadHllDailyRegs(spark: SparkSession, path: String, dir: String,
                       slice: String): DataFrame =
    load(spark, path, "hll_daily_regs",
      DataVersion.key(dir, "events", s"hll#$slice"),
      Some(s"m=${operators.Sketches.hllRegisters}"))._2

  // ---- Theta/KMV sketch ---------------------------------------------------

  /** The KMV sketch frame (the ≤ k smallest 60-bit key hashes — exact
    * integers), the set-algebra sibling of [[saveHllDailyRegs]]: KMV
    * state is MERGEABLE by re-min (the k smallest of two stored
    * sketches' union ARE the k smallest of the underlying set union),
    * so nightly shards save their sketches and any later
    * intersection/union query merges stored frames without touching
    * raw keys ([[operators.Sketches.thetaKmvOf]]; ThetaSketchSpec
    * certifies merge == recompute and the served estimates bit-equal).
    */
  def saveThetaSketch(spark: SparkSession, path: String, dir: String,
                      slice: String, kmv: DataFrame): Unit =
    save(spark, path,
      Meta("theta_kmv", DataVersion.key(dir, "orders", s"theta#$slice"),
        s"k=${operators.Sketches.thetaK}"),
      kmv.select("h"))

  def loadThetaSketch(spark: SparkSession, path: String, dir: String,
                      slice: String): DataFrame =
    load(spark, path, "theta_kmv",
      DataVersion.key(dir, "orders", s"theta#$slice"),
      Some(s"k=${operators.Sketches.thetaK}"))._2

  // ---- Line census --------------------------------------------------------

  /** The corpus line census (line, c, fk — exact integers + the line
    * text), the C4-dedup sibling of [[saveHdrCells]]: the census is
    * MERGEABLE (c sums, fk min-merges across any corpus split —
    * [[operators.TextAnalysis.lineCensus]]), so the nightly line-dedup
    * increment reloads the base census and merges only the delta
    * batch's census ([[operators.TextAnalysis.lineDedupIncremental]])
    * — verdict-equal to a full recompute, which the driver's
    * `text_line_dedup_incr` oracle certifies by hash. Same slice-stamp
    * semantics as the sketch families.
    */
  def saveLineCensus(spark: SparkSession, path: String, dir: String,
                     slice: String, census: DataFrame): Unit =
    save(spark, path,
      Meta("line_census", DataVersion.key(dir, "documents", s"lines#$slice"),
        s"width=${operators.TextAnalysis.lineWords}"),
      census.select("line", "c", "fk"))

  def loadLineCensus(spark: SparkSession, path: String, dir: String,
                     slice: String): DataFrame =
    load(spark, path, "line_census",
      DataVersion.key(dir, "documents", s"lines#$slice"),
      Some(s"width=${operators.TextAnalysis.lineWords}"))._2

  // ---- CMS cells ----------------------------------------------------------

  /** The count-min sketch's cell table (row_j, bucket, cnt — exact
    * integers), the frequency sibling of [[saveHdrCells]]: cells are
    * LINEAR (keyed sum is the union), so the increment reloads the
    * base cells and sums the delta batch's cells
    * ([[operators.Sketches.cmsTokenCountsServed]]) — bit-equal to a
    * full recompute. Same slice-stamp semantics as the HDR cells.
    */
  def saveCmsCells(spark: SparkSession, path: String, dir: String,
                   slice: String, cells: DataFrame): Unit =
    save(spark, path,
      Meta("cms_cells", DataVersion.key(dir, "documents", s"cms#$slice"),
        s"d=${operators.Sketches.cmsDepth}#w=${operators.Sketches.cmsWidth}"),
      cells.select("row_j", "bucket", "cnt"))

  def loadCmsCells(spark: SparkSession, path: String, dir: String,
                   slice: String): DataFrame =
    load(spark, path, "cms_cells",
      DataVersion.key(dir, "documents", s"cms#$slice"),
      Some(s"d=${operators.Sketches.cmsDepth}#w=${operators.Sketches.cmsWidth}"))._2

  // ---- Bloom bitmap -----------------------------------------------------

  def saveBloom(spark: SparkSession, path: String, dir: String,
                m: Long, words: Array[Long]): Unit = {
    import spark.implicits._
    save(spark, path,
      Meta("bloom", DataVersion.key(dir, "documents", "bloom"), s"m=$m"),
      words.toSeq.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("ord", "word"))
  }

  def loadBloom(spark: SparkSession, path: String,
                dir: String): (Long, Array[Long]) = {
    import spark.implicits._
    val (meta, df) = load(spark, path, "bloom",
      DataVersion.key(dir, "documents", "bloom"))
    (meta.params.stripPrefix("m=").toLong,
      df.orderBy("ord").select("word").as[Long].collect())
  }
}
