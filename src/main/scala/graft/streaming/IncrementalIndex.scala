package graft.streaming

import java.io.File

import graft.functions.VectorOps
import graft.operators.Similarity
import graft.sources.ManifestTable
import graft.sources.ManifestTable.TableBatch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incrementally maintained vector indexes (IVF cells + PQ codes) over a
  * growing embedding corpus — the continuous-ingest shape of the ANN
  * stack: [[graft.operators.Similarity]]'s `buildIndex`/`buildPq` are
  * one-shot fits over a static dir, so every embedding drop forced a full
  * rebuild; this maintainer keeps the SAME index structures current from
  * a `graft-cdf` change-feed subscription, the way [[IncrementalDedup]]
  * keeps the LSH posting list current.
  *
  * Steady state is MAP-ONLY: a new batch's vectors assign to the stored
  * centroids / codebooks by broadcast argmin — no shuffle wider than the
  * batch, no touch of the stored corpus. The fits only re-run when the
  * corpus has outgrown them: a batch that pushes the corpus past
  * [[DriftFactor]]× the size the current fit was trained on triggers a
  * refit (bounded-sample Lloyd, the `Similarity.centroids` recipe) and a
  * full reassignment — amortized over the doubling schedule that is
  * O(log n) refits ever, each linear. Centroid drift without growth is
  * invisible to a count trigger, so [[driftScore]] also exposes the
  * batch's mean assignment quality against the fit-time baseline for an
  * operator alerting on distribution shift.
  *
  * Storage is one [[ManifestTable]] root, all tables committed in ONE
  * atomic swap per batch (a crash never leaves codes ahead of vectors;
  * replayed batch ids are no-ops):
  *  - `vectors`     (vec_id, embedding, nrm)  merge-keyed corpus record
  *  - `centroids`   (c_id, c_emb, c_nrm)      the IVF fit (≤256 rows)
  *  - `ivf_assign`  (vec_id, c_id)            cell per vector
  *  - `pq_codebook` (m, code, cw)             per-subspace codewords
  *  - `pq_codes`    (vec_id, m, code)         the compressed index
  *  - `meta`        (k, fit_count)            size the fits were trained at
  *
  * Deletes/updates ride the feed: postimages re-merge (vector, cell,
  * codes all keyed on vec_id), deletes drop the key from every table.
  */
object IncrementalIndex {

  val VectorsTable = "vectors"
  val CentroidsTable = "centroids"
  val AssignTable = "ivf_assign"
  val CodebookTable = "pq_codebook"
  val CodesTable = "pq_codes"
  val MetaTable = "meta"
  val QueryId = "vecindex"

  val VecBuckets = 8
  val DriftFactor = 2.0
  val Dim: Int = Similarity.Dim
  val MaxCentroids: Int = Similarity.MaxCentroids
  val FitSample: Int = Similarity.FitSample
  val KmeansIters: Int = Similarity.KmeansIters

  private def withNorm(batch: DataFrame): DataFrame =
    batch.select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"))

  /** Bounded deterministic IVF fit over an arbitrary (vec_id, embedding,
    * nrm) frame: hash-ordered seeds (layout-independent, the PqK-seed
    * lesson) capped at [[MaxCentroids]], Lloyd on a hash-ordered
    * ≤[[FitSample]] sample — identical inputs give identical fits, which
    * is what lets the incremental-refit index equal a from-scratch build.
    */
  private def fitCentroids(vecs: DataFrame): DataFrame = {
    // C ≈ √n (the standard IVF sizing: cell population ≈ probe cost ≈
    // √n) capped at MaxCentroids so the fit stays bounded at any corpus
    // size — beyond the cap, cells grow instead of the fit
    val c = math.max(1, math.min(MaxCentroids,
      math.ceil(math.sqrt(vecs.count().toDouble)).toInt))
    val seeds = vecs
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(c)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    val fit = vecs
      .orderBy(xxhash64(col("vec_id") + 1), col("vec_id")).limit(FitSample)
    (1 to KmeansIters).foldLeft(seeds) { (c, _) =>
      fit.join(broadcast(c), lit(true))
        .withColumn("ccos", VectorOps.cosinePre(
          col("embedding"), col("nrm"), col("c_emb"), col("c_nrm")))
        .groupBy("vec_id")
        .agg(max_by(col("c_id"), col("ccos")).as("c_id"),
          first(col("embedding")).as("embedding"))
        .groupBy("c_id")
        .agg(Similarity.elementMean(Dim, col("embedding")).as("c_emb"))
        .select(col("c_id"), col("c_emb"),
          VectorOps.norm(col("c_emb")).as("c_nrm"))
    }
  }

  /** Map-only cell assignment against broadcast centroids. */
  private def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.join(broadcast(cents), lit(true))
      .withColumn("ccos", VectorOps.cosinePre(
        col("embedding"), col("nrm"), col("c_emb"), col("c_nrm")))
      .groupBy("vec_id")
      .agg(max_by(col("c_id"), col("ccos")).as("c_id"),
        max(col("ccos")).as("ccos"))

  private val SubDim = Dim / Similarity.PqM

  private def subvectors(vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"),
      explode(array((0 until Similarity.PqM).map(m =>
        struct(lit(m).as("m"),
          slice(col("embedding"), m * SubDim + 1, SubDim).as("sv"))): _*))
        .as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))

  private def d2(sv: org.apache.spark.sql.Column, cw: org.apache.spark.sql.Column,
      cwn2: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    cwn2 - lit(2.0) * VectorOps.dot(sv, cw)

  /** Bounded deterministic per-subspace PQ codebooks (the
    * `Similarity.pqCodebook` recipe over an arbitrary frame).
    */
  private def fitCodebook(vecs: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    val sub = subvectors(vecs)
    val seedIds = vecs.select(col("vec_id"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(Similarity.PqK)
      .collect().map(_.getLong(0)).sorted
    val seedCodes = spark.createDataFrame(
      seedIds.zipWithIndex.map { case (id, i) => (id, i) }.toSeq)
      .toDF("vec_id", "code")
    val seeds = sub.join(broadcast(seedCodes), "vec_id")
      .select(col("m"), col("code"), col("sv").as("cw"))
    (1 to Similarity.PqIters).foldLeft(seeds) { (cb, _) =>
      val cbn = cb.withColumn("cwn2", VectorOps.dot(col("cw"), col("cw")))
      sub.join(broadcast(cbn), Seq("m"))
        .withColumn("d2", d2(col("sv"), col("cw"), col("cwn2")))
        .groupBy("vec_id", "m")
        .agg(min(struct(col("d2"), col("code"))).getField("code").as("code"),
          first(col("sv")).as("sv"))
        .groupBy("m", "code")
        .agg(Similarity.elementMean(SubDim, col("sv")).as("cw"))
    }
  }

  /** Map-only code assignment against a broadcast codebook. */
  private def codes(vecs: DataFrame, cb: DataFrame): DataFrame = {
    val cbn = cb.withColumn("cwn2", VectorOps.dot(col("cw"), col("cw")))
    subvectors(vecs).join(broadcast(cbn), Seq("m"))
      .withColumn("d2", d2(col("sv"), col("cw"), col("cwn2")))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d2"), col("code"))).getField("code").as("code"))
  }

  /** Corpus size the current fit was trained on (0 = no fit yet). */
  def fitCount(spark: SparkSession, root: String): Long = {
    val f = new File(root)
    if (ManifestTable.read(f).exists(_.tables.contains(MetaTable)))
      ManifestTable.readTable(spark, root, table = MetaTable)
        .agg(max("fit_count")).head.getLong(0)
    else 0L
  }

  /** Ingest one feed batch of (vec_id, embedding [, _change_type]) rows:
    * map-only assignment in the steady state, refit + full reassignment
    * when the corpus outgrew the fit, everything committed in one atomic
    * swap. Returns the number of vectors now indexed.
    */
  def ingest(spark: SparkSession, root: File, batchId: Long,
      feedBatch: DataFrame): Long = {
    val hasType = feedBatch.columns.contains(ManifestTable.ChangeTypeCol)
    val upserts0 = (if (hasType)
      feedBatch.filter(col(ManifestTable.ChangeTypeCol)
        .isin("insert", "update_postimage"))
    else feedBatch).select("vec_id", "embedding")
    val deletes: Option[DataFrame] = if (hasType) {
      val d = feedBatch.filter(col(ManifestTable.ChangeTypeCol) === "delete")
        .select("vec_id").distinct()
      if (d.isEmpty) None else Some(d.persist())
    } else None
    val batch = withNorm(upserts0).persist()
    try {
      val rootS = root.toString
      val haveIndex = fitCount(spark, rootS) > 0L
      val stored: DataFrame =
        if (haveIndex || ManifestTable.read(root).exists(
            _.tables.contains(VectorsTable)))
          ManifestTable.readTable(spark, rootS, table = VectorsTable)
        else batch.limit(0)
      // the corpus as this commit will leave it (merge semantics: batch
      // postimages win on key collision, deletes drop)
      val afterKeys = stored.join(batch, Seq("vec_id"), "left_anti")
      val after0 = afterKeys.unionByName(batch)
      val after = deletes.fold(after0)(d =>
        after0.join(d, Seq("vec_id"), "left_anti")).persist()
      val total = after.count()

      val trained = fitCount(spark, rootS)
      val needFit = trained == 0L || total.toDouble >= DriftFactor * trained
      val (cents, cb, assignRows, codeRows, fitMeta) =
        if (needFit) {
          // (re)fit on the post-commit corpus and reassign EVERYTHING —
          // the doubling schedule makes this O(log n) refits ever, and
          // fitting on exactly `after` is what makes the refit index
          // byte-equal a from-scratch build over the same corpus
          val c = fitCentroids(after).persist()
          val k = fitCodebook(after).persist()
          (c, k, assign(after, c), codes(after, k),
            Some(spark.createDataFrame(Seq(("fit", total)))
              .toDF("k", "fit_count")))
        } else {
          val c = ManifestTable.readTable(spark, rootS, table = CentroidsTable)
          val k = ManifestTable.readTable(spark, rootS, table = CodebookTable)
          (c, k, assign(batch, c), codes(batch, k), None)
        }

      // a refit REPLACES the fit tables: old centroid/codeword ids absent
      // from the new fit must not survive as stale rows, so the previous
      // key sets ride along as delete keys (replace-by-key semantics)
      def oldKeys(table: String, keyCols: String*): Option[DataFrame] =
        if (ManifestTable.read(root).exists(_.tables.contains(table)))
          Some(ManifestTable.readTable(spark, rootS, table = table)
            .select(keyCols.map(col).toIndexedSeq: _*))
        else None
      val batches = Seq(
        TableBatch(VectorsTable, batch, Seq("vec_id"), VecBuckets,
          deleteKeys = deletes),
        TableBatch(AssignTable, assignRows.select("vec_id", "c_id"),
          Seq("vec_id"), VecBuckets, deleteKeys = deletes),
        // pq_codes carries PqM rows per key: replace-by-key (delete the
        // touched ids, insert the batch's codes) — a plain row-level
        // upsert would cross-join the old and new code rows per key
        TableBatch(CodesTable, codeRows, Seq("vec_id"), VecBuckets,
          deleteKeys = Some(deletes.fold(
            codeRows.select("vec_id").distinct())(d =>
            codeRows.select("vec_id").distinct().unionByName(d))))) ++
        (if (needFit) Seq(
          TableBatch(CentroidsTable, cents, Seq("c_id"), 1,
            deleteKeys = oldKeys(CentroidsTable, "c_id")),
          TableBatch(CodebookTable, cb, Seq("m", "code"), 1,
            deleteKeys = oldKeys(CodebookTable, "m", "code")),
          TableBatch(MetaTable, fitMeta.get, Seq("k"), 1))
        else Nil)
      ManifestTable.mergeBatch(root, QueryId, batchId, batches)
      if (needFit) { cents.unpersist(); cb.unpersist(); () }
      after.unpersist()
      total
    } finally { batch.unpersist(); deletes.foreach(_.unpersist()); () }
  }

  /** Maintain continuously from a `graft-cdf` subscription on a source
    * embedding table (AvailableNow: drain the committed backlog and
    * return). Checkpointed exactly-once like every other feed consumer.
    */
  def sync(spark: SparkSession, sourceRoot: String, indexRoot: String,
      checkpoint: String, sourceTable: String = ManifestTable.DefaultTable): Unit = {
    val q = spark.readStream.format("graft-cdf")
      .option("path", sourceRoot).option("table", sourceTable)
      .load()
      .writeStream.option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch((b: DataFrame, bid: Long) =>
        { ingest(spark, new File(indexRoot), bid, b); () })
      .start()
    q.awaitTermination()
  }

  /** Mean assignment quality (cosine to nearest centroid) of a frame
    * under the STORED fit — compare against the fit-time corpus to alert
    * on centroid drift that count-based refit can't see.
    */
  def driftScore(spark: SparkSession, root: String, vecs: DataFrame): Double =
    assign(withNorm(vecs),
      ManifestTable.readTable(spark, root, table = CentroidsTable))
      .agg(avg("ccos")).head.getDouble(0)

  /** ANN top-k through the maintained index: probes rank the broadcast
    * centroids, open their `nProbes` best cells, exact-cosine only the
    * vectors in those cells (cell membership via the stored assignment,
    * vectors via the corpus table — both bucket-local joins).
    */
  def annTopK(spark: SparkSession, root: String, probes: DataFrame,
      k: Int = 10, nProbes: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = ManifestTable.readTable(spark, root, table = CentroidsTable)
    val p = withNorm(probes)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val probeCells = p.join(broadcast(cents), lit(true))
      .withColumn("ccos", VectorOps.cosinePre(
        col("q_emb"), col("q_nrm"), col("c_emb"), col("c_nrm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("ccos").desc, col("c_id"))))
      .filter(col("rk") <= nProbes)
      .select("q_id", "q_emb", "q_nrm", "c_id")
    val members = ManifestTable.readTable(spark, root, table = AssignTable)
      .join(ManifestTable.readTable(spark, root, table = VectorsTable),
        Seq("vec_id"))
    probeCells.join(members, Seq("c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", VectorOps.cosinePre(
        col("q_emb"), col("q_nrm"), col("embedding"), col("nrm")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("cosine"), col("rank"))
  }
}
