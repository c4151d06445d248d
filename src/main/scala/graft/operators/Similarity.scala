package graft.operators

import graft.{Q, Tables}
import graft.functions.{HashExprs, VectorOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY §2.D): threshold near-dup pairs,
  * brute-force cosine top-k (the correctness baseline), and an IVF-style
  * clustered ANN (the 100 TB path: centroid assignment is a broadcast
  * map-only pass; probing touches only the nearest clusters' rows).
  */
object Similarity {

  val CosineThreshold = 0.35
  val TopK = 10
  val Probes = 2 // IVF clusters probed per query
  val Dim = 64   // embedding dimensionality of the corpus

  // SRP-LSH banding: P(sign-bit match) = 1 − θ/π ≈ 0.61 at cosine 0.35,
  // so 4-bit bands hit 0.142 per band → 20 bands give ~0.96 recall at the
  // threshold. Measured candidate volume (tools.DupBench on the planted
  // sf0.1 corpus): ~71% of all pairs — 4-bit bands pass ~0.5⁴-per-band
  // background even on near-orthogonal vectors, and LOW-threshold pair
  // enumeration is where SRP amplification is intrinsically weakest
  // (ρ = ln p₁⁻¹/ln p₀⁻¹ ≈ 0.71 at cos 0.35 vs 0 → best-case candidates
  // ~n^1.71 no matter the banding). emb_cosine_lsh therefore earns its
  // keep only as the no-nested-loop, shuffle-bounded formulation of the
  // SAME 0.35-threshold contract as the brute query; the operator a 100 TB
  // dedup pipeline actually runs at scale is [[nearDupPairs]] (high
  // threshold, where banding prunes by orders of magnitude) or the
  // IVF-bounded SemDeDup path.
  val SrpBits = 4
  val SrpBands = 20

  // High-threshold near-dup blocking — the production semantic-dedup
  // operating point (SemDeDup/FAISS dedup run at cosine ≥0.85-0.95, not
  // 0.35). Banding is tuned for recall AT the threshold, the worst case:
  // p₁ = 1 − θ/π ≈ 0.823 at cos 0.85 → 16-bit bands hit 0.044, so 72
  // bands give ~0.96 recall for a pair sitting exactly on the threshold
  // (and ~0.999 at cos 0.9), while near-orthogonal background passes
  // 0.5¹⁶ ≈ 1.5e-5 per band → ~1e-3 of pairs become candidates.
  // DupBench-measured on the planted sf0.1 corpus: see SURVEY §5.
  val NearDupThreshold = 0.85
  val NearDupBits = 16
  val NearDupBands = 72

  private def embs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), col("label"),
        VectorOps.norm(col("embedding")).as("nrm"))

  /** Fanned-out variant for the O(n²)-ish pair generators (brute pairs,
    * SRP band hashing + collision scoring): their per-row work is heavy
    * enough that a one-row-group scan serializes the whole operator —
    * see Tables.fanOut. The cheap map-only consumers stay on the plain
    * scan (the exchange would cost more than it parallelizes).
    */
  private def embsFanned(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.embeddings(s, d))
      .select(col("vec_id"), col("embedding"), col("label"),
        VectorOps.norm(col("embedding")).as("nrm"))

  /** High-threshold embedding near-dup pairs over any (vec_id, embedding)
    * frame: SRP blocking tuned for the near-dup band (16 bits × 72 bands),
    * exact cosine verification on the candidates only. Candidate volume on
    * a near-orthogonal background is ~1e-3 of n²/2 by construction — the
    * embedding-side blocking that actually scales to 100 TB (spec:
    * PipelineSpec planted-twin recall; measured: tools.DupBench).
    */
  def nearDupPairs(e: DataFrame, threshold: Double = NearDupThreshold,
      dim: Int = Dim): DataFrame = {
    // dim must match the frame's embedding width: the SRP plane matrix is
    // sized by it, and a mismatch silently projects only a prefix
    val withNorm = Tables.fanOut(e).select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"))
    // verify-then-dedup (same shape as emb_cosine_lsh): vectors ride
    // through the band join, the codegen'd cosine runs at each collision,
    // and the distinct covers only threshold-passing pairs — never the
    // full candidate multiset
    val keyed = withNorm.select(col("vec_id"), col("embedding"), col("nrm"),
      explode(HashExprs.srpBands(col("embedding"), dim, NearDupBits,
        NearDupBands)).as("bk"))
    keyed
      .join(keyed.select(col("vec_id").as("vec_id_b"),
        col("embedding").as("emb_b"), col("nrm").as("nrm_b"), col("bk")),
        Seq("bk"))
      .filter(col("vec_id") < col("vec_id_b"))
      .withColumn("cosine", VectorOps.cosinePre(
        col("embedding"), col("nrm"), col("emb_b"), col("nrm_b")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_id").as("vec_id_a"), col("vec_id_b"), col("cosine"))
      .distinct()
  }

  /** Deterministic query subset: every 100th vector. */
  private def queries(s: SparkSession, d: String): DataFrame =
    embs(s, d).filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))

  val KmeansIters = 2

  /** Element-wise mean of a fixed-width float-array column per group:
    * `width` parallel codegen'd sum buffers + one count through ONE
    * partial-agg shuffle. Replaces the posexplode M-step shape (width×
    * row blowup → groupBy(key, dim) → collect_list re-assembly — two
    * shuffles and a sort); the buffer per group key is O(width) doubles,
    * bounded regardless of corpus size.
    */
  private[graft] def elementMean(width: Int, vec: Column): Column =
    array((0 until width).map(i =>
      (sum(element_at(vec, i + 1).cast("double")) / count(lit(1)))
        .cast("float")): _*)

  /** IVF centroids: deterministic seeds (every 50th vector, capped at
    * [[MaxCentroids]]) refined by `KmeansIters` Lloyd iterations over a
    * bounded fit sample, entirely as DataFrame ops. E-step =
    * broadcast-centroid nearest assignment (map-only, the n×C expansion
    * collapses via partial agg); M-step = dimension-wise mean via
    * `elementMean` — one bounded-buffer shuffle, so no step ever
    * materializes a partition-sized vector on one node.
    *
    * Scale shape: an UNcapped C ∝ n/50 makes the fit Θ(n²/50) — fine to
    * ~10⁴ vectors, structural at 100 TB. Capping C and fitting Lloyd on a
    * ≤[[FitSample]] deterministic sample (the standard production-IVF
    * train-on-sample recipe) bounds the fit at sample×C per iteration
    * regardless of corpus size; the one full-corpus pass left is the
    * final n×C cell assignment, which ANY IVF index must pay and which is
    * linear at fixed C. Below both thresholds the fit is byte-identical
    * to the uncapped one (stride 50, full fit set), so small-scale
    * oracles and recall specs are unaffected.
    *
    * Measured on sf0.01 (isotropic synthetic clusters): raw sample seeds
    * 0.98 recall@10, Lloyd-refined 0.88, identical cluster balance — the
    * sample happens to land in every synthetic cluster. The fit stays the
    * default anyway: on real corpora the sample inherits the data's skew
    * and unbalanced cells destroy probe cost, which is why production IVF
    * trains centroids. Recall is tunable via `Probes` at ~n/C scan cost
    * per extra probe.
    */
  val MaxCentroids = 256
  val FitSample = 20000
  private val centCache = graft.Caches.dfCache()

  /** The fitted index is trained once per (session, corpus) and persisted —
    * the in-process analogue of storing a trained IVF index; every probe
    * re-deriving the Lloyd chain would re-pay the fit.
    */
  private[graft] def centroids(s: SparkSession, d: String): DataFrame =
    centCache.getOrElseUpdate(s, d)(
      graft.Caches.pinDim(fitCentroids(s, d), col("c_id")))

  /** Driver-side Lloyd fit over the bounded sample. Both inputs are
    * bounded BY DESIGN at any corpus size — seeds ≤ ~2·MaxCentroids rows,
    * fit ≤ ~2·FitSample rows (≈5 MB of floats) — so the rounds are pure
    * in-memory loops: the production train-on-sample recipe (FAISS trains
    * IVF centroids on one node from a sample for the same reason). The
    * only corpus-sized pass, the final cell assignment, stays distributed
    * (ivfAssigned). The previous DataFrame loop paid a sample×C row
    * expansion plus two aggregation exchanges PER ITERATION to express a
    * per-row argmax (guide §2.4/§5: the driver does dimension-sized work
    * only). Arithmetic is the same double-widened left-to-right fold as
    * FloatVectorDot/elementMean; the argmax keeps the first maximum in
    * ascending-c_id order, matching the broadcast join's build-row order.
    */
  private def fitCentroids(s: SparkSession, d: String): DataFrame = {
    // raw table, not the fanned-out embs: the fit only COLLECTS bounded
    // samples, and the fan-out exchange would be a pure extra stage
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val seedStride = math.max(50L, n / MaxCentroids)
    val fitStride = math.max(1L, n / FitSample)
    def collectVecs(df: DataFrame): Array[(Long, Array[Float])] =
      df.select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
    val seeds = collectVecs(e.filter(col("vec_id") % seedStride === 0))
    val fit = collectVecs(
      if (fitStride == 1L) e else e.filter(col("vec_id") % fitStride === 0))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      val len = math.min(a.length, b.length)
      var acc = 0.0; var i = 0
      while (i < len) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    var cents: Array[(Long, Array[Float], Double)] =
      seeds.map { case (id, v) => (id, v, norm(v)) }
    for (_ <- 1 to KmeansIters) {
      // E-step: nearest centroid per fit vector; M-step: per-dimension
      // double mean accumulated in ascending-vec_id fit order
      val sums = scala.collection.mutable.LinkedHashMap
        .empty[Long, (Array[Double], Long)]
      fit.foreach { case (_, v) =>
        val nv = norm(v)
        var best = -1; var bestScore = Double.NegativeInfinity
        var ci = 0
        while (ci < cents.length) {
          val sc = dot(v, cents(ci)._2) / (nv * cents(ci)._3)
          if (sc > bestScore) { bestScore = sc; best = ci }
          ci += 1
        }
        val key = cents(if (best < 0) 0 else best)._1
        val (acc, cnt) = sums.getOrElse(key, (new Array[Double](Dim), 0L))
        val len = math.min(Dim, v.length)
        var i = 0
        while (i < len) { acc(i) += v(i).toDouble; i += 1 }
        sums(key) = (acc, cnt + 1)
      }
      cents = sums.toArray.sortBy(_._1).map { case (id, (acc, cnt)) =>
        val m = acc.map(x => (x / cnt).toFloat)
        (id, m, norm(m))
      }
    }
    import s.implicits._
    cents.toSeq.toDF("c_id", "c_emb", "c_nrm")
  }

  private val assignCache = graft.Caches.dfCache()

  /** Cached IVF assignment — (vec_id, c_id, embedding, nrm), the "which
    * cell does each vector live in" table both the probe query and
    * SemDeDup read. Without the persist, each REFERENCE to the frame
    * re-runs the n×C broadcast-cosine pass (SemDeDup referenced it three
    * times → 3× its dominant cost).
    */
  private[graft] def ivfAssigned(s: SparkSession, d: String): DataFrame =
    assignCache.getOrElseUpdate(s, d) {
      // the fitted centroid matrix is dimension-sized (≤MaxCentroids ×
      // Dim floats); riding it into a codegen'd per-row argmax makes the
      // full-corpus cell assignment MAP-ONLY — the previous broadcast
      // cross-expansion multiplied the corpus by C and paid a full
      // aggregation exchange to collapse it back (guide §2.4)
      val e = embs(s, d)
      val cRows = centroids(s, d).select("c_id", "c_emb", "c_nrm").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
        .sortBy(_._1)
      val ids = cRows.map(_._1)
      val flat = new Array[Float](cRows.length * Dim)
      cRows.zipWithIndex.foreach { case ((_, v, _), i) =>
        System.arraycopy(v, 0, flat, i * Dim, math.min(Dim, v.length)) }
      val cnorms = cRows.map(_._3)
      val assigned = e.select(col("vec_id"),
        graft.functions.NearestIdx.nearestCentroidId(
          col("embedding"), col("nrm"), ids, flat, cnorms, Dim).as("c_id"),
        col("embedding"), col("nrm"))
      graft.Caches.pinLayout(assigned, partKeys = Seq(col("vec_id")),
        order = Seq(col("vec_id")))
    }

  /** Force the one-time IVF index fit (Bench line item). */
  def buildIndex(s: SparkSession, d: String): Long =
    centroids(s, d).count() + ivfAssigned(s, d).count()

  /** Force the one-time PQ codebook fit + code assignment (Bench line
    * item, like the other stored indexes — otherwise the fit hides in
    * emb_pq_codes' first timed iteration).
    */
  def buildPq(s: SparkSession, d: String): Long =
    pqCodebook(s, d).count() + pqCodes(s, d).count()

  // ------------------------------------------------------------------
  // Product quantization (the FAISS-style ANN compression): vectors split
  // into PqM subspaces, each quantized against its own PqK-codeword
  // codebook → 64 floats (256 B) become 8 5-bit codes (5 B), a ~51×
  // shrink, with reconstruction error far below one global codebook.
  // ------------------------------------------------------------------
  val PqM = 8        // subspaces (64-dim → 8 dims each)
  val PqK = 32       // codewords per subspace (5-bit codes)
  val PqIters = 3    // Lloyd refinements per subspace
  val PqShortK = 100 // ADC shortlist size fed to the exact rerank

  /** Subvector grain: (vec_id, m, sv) — one row per vector per subspace,
    * sliced declaratively (map-only).
    */
  private def subvectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      explode(array((0 until PqM).map(m =>
        struct(lit(m).as("m"),
          slice(col("embedding"), m * (64 / PqM) + 1, 64 / PqM).as("sv"))): _*))
        .as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))

  /** Squared-distance argmin term: |sv − cw|² = |sv|² − 2·sv·cw + |cw|²;
    * |sv|² is constant per row, so the argmin only needs −2·dot + |cw|².
    */
  private def d2(sv: Column, cw: Column, cwn2: Column): Column =
    cwn2 - lit(2.0) * VectorOps.dot(sv, cw)

  private val pqCache = graft.Caches.dfCache()
  private val pqCodesCache = graft.Caches.dfCache()

  /** Per-subspace codebooks, k-means-fitted distributively exactly like the
    * IVF centroids (deterministic seeds, Lloyd via broadcast E-step +
    * `elementMean` M-step — the codebook is PqM·PqK rows, always
    * broadcastable), trained once per (session, corpus).
    */
  /** Flattened (m, code)-sorted codebook for the argmin expression:
    * entries for subspace m live at [offsets(m), offsets(m+1)).
    */
  private def flatCodebook(entries: Array[(Int, Int, Array[Float])])
      : (Array[Int], Array[Int], Array[Float], Array[Double]) = {
    val subDim = 64 / PqM
    val offsets = new Array[Int](PqM + 1)
    entries.foreach { case (m, _, _) => offsets(m + 1) += 1 }
    (1 to PqM).foreach(m => offsets(m) += offsets(m - 1))
    val codes = entries.map(_._2)
    val cws = new Array[Float](entries.length * subDim)
    val cwn2 = new Array[Double](entries.length)
    entries.zipWithIndex.foreach { case ((_, _, cw), i) =>
      System.arraycopy(cw, 0, cws, i * subDim, math.min(subDim, cw.length))
      var acc = 0.0; var j = 0
      while (j < cw.length) { acc += cw(j).toDouble * cw(j).toDouble; j += 1 }
      cwn2(i) = acc
    }
    (offsets, codes, cws, cwn2)
  }

  private[graft] def pqCodebook(s: SparkSession, d: String): DataFrame =
    pqCache.getOrElseUpdate(s, d)(graft.Caches.pinDim(
      {
      val subDim = 64 / PqM
      // seed selection must not assume ANYTHING about the id layout: a
      // modulus stride collapses under sparse/offset ids (e.g. replicated
      // corpora with billion-shifted keys → 4 effective codewords instead
      // of 32, halving recall). Hash-order the ids and take exactly PqK —
      // a deterministic pseudo-random sample at one tiny TakeOrdered job,
      // collected (PqK longs) inside the cached one-time fit
      val seedIds = Tables.embeddings(s, d).select(col("vec_id"))
        .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(PqK)
        .collect().map(_.getLong(0)).sorted
      val seedVecs = Tables.embeddings(s, d)
        .filter(col("vec_id").isin(seedIds: _*))
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
      // initial codebook: the seed vectors' subvector slices, code =
      // seed rank — exactly the old sub⋈seedCodes frame
      var entries: Array[(Int, Int, Array[Float])] =
        (for (m <- 0 until PqM; (id, ci) <- seedIds.zipWithIndex)
          yield (m, ci, seedVecs(id).slice(m * subDim, m * subDim + subDim)))
          .toArray.sortBy(t => (t._1, t._2))
      // each Lloyd round is ONE distributed job: a map-only codegen'd
      // argmin (ascending-code strict-less ≡ the old min(struct(d2,
      // code)) tie-break) feeding one keyed elementMean aggregation whose
      // PqM·PqK-row result collects back as the next round's codebook —
      // the previous fold chained sub⋈broadcast(cb) plans (a PqK× row
      // expansion + two aggregation exchanges per round) into one lazily
      // re-executed tree
      val sub = subvectors(embs(s, d))
      for (_ <- 1 to PqIters) {
        val (offsets, codes, cws, cwn2) = flatCodebook(entries)
        entries = sub
          .select(col("m"),
            graft.functions.NearestIdx.nearestCode(col("sv"), col("m"),
              offsets, codes, cws, cwn2, subDim).as("code"),
            col("sv"))
          .groupBy("m", "code")
          .agg(elementMean(subDim, col("sv")).as("cw"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
          .sortBy(t => (t._1, t._2))
      }
      import s.implicits._
      entries.toSeq.toDF("m", "code", "cw")
      }, col("m"), col("code")))

  /** The stored PQ index: nearest-codeword id per (vector, subspace) —
    * what a deployment persists in place of the float vectors. Cached per
    * (session, corpus) like the codebook; both ADC search and the codes
    * query read it.
    */
  private[graft] def pqCodes(s: SparkSession, d: String): DataFrame =
    pqCodesCache.getOrElseUpdate(s, d) {
      // map-only code assignment against the fitted codebook (collected —
      // PqM·PqK rows by construction): no PqK× row expansion, no
      // aggregation exchange (see ivfAssigned)
      val subDim = 64 / PqM
      val entries = pqCodebook(s, d).select("m", "code", "cw").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
        .sortBy(t => (t._1, t._2))
      val (offsets, codes0, cws, cwn2) = flatCodebook(entries)
      val codes = subvectors(embs(s, d))
        .select(col("vec_id"), col("m"),
          graft.functions.NearestIdx.nearestCode(col("sv"), col("m"),
            offsets, codes0, cws, cwn2, subDim).as("code"))
      graft.Caches.pinLayout(codes, partKeys = Seq(col("vec_id")),
        order = Seq(col("vec_id"), col("m")))
    }

  val PowerIters = 500

  private val pcaCache = graft.Caches.dfCache()

  /** Dominant principal component of the embedding covariance.
    *
    * ONE data-parallel pass computes the sufficient statistic — per
    * partition, (n, Σx, Σxx^T): at Dim=64 that is 1 + 64 + 4096 doubles,
    * the MLlib RowMatrix.computeGramianMatrix treeAggregate shape. The
    * driver combines P partition rows into C = Σxx^T/n − μμ^T (a 64×64
    * matrix — O(P·Dim²) collected, never row data) and power-iterates at
    * memory speed, so convergence runs to a fixed point instead of a
    * budget of distributed scans. The earlier formulation paid one
    * full-corpus pass + 64-key shuffle PER iteration (up to 25 scans);
    * on a 1000-executor corpus each of those scans is minutes — the
    * one-pass statistic is the only shape that survives 100 TB. The
    * per-partition accumulation is justified imperative mapPartitions
    * (the heavy-hitters precedent): a bounded O(Dim²) buffer, emitting
    * one row per partition.
    */
  private def dominantComponent(s: SparkSession, d: String): DataFrame =
    pcaCache.getOrElseUpdate(s, d) {
      import s.implicits._
      val parts = Tables.embeddings(s, d).select(col("embedding"))
        .as[Array[Float]].mapPartitions { rows =>
          val sumx = new Array[Double](Dim)
          val gram = new Array[Double](Dim * Dim)
          var n = 0L
          while (rows.hasNext) {
            val x = rows.next()
            var i = 0
            while (i < Dim) {
              val xi = x(i).toDouble
              sumx(i) += xi
              // upper triangle only; mirrored at combine time
              var j = i
              while (j < Dim) { gram(i * Dim + j) += xi * x(j); j += 1 }
              i += 1
            }
            n += 1
          }
          if (n == 0L) Iterator.empty else Iterator.single((n, sumx, gram))
        }.collect()
      val n = parts.map(_._1).sum.toDouble
      val mu = Array.tabulate(Dim)(i => parts.map(_._2(i)).sum / n)
      val cov = Array.tabulate(Dim, Dim) { (i, j) =>
        val (lo, hi) = if (i <= j) (i, j) else (j, i)
        parts.map(_._3(lo * Dim + hi)).sum / n - mu(i) * mu(j)
      }
      var v = Array.fill(Dim)(1.0 / math.sqrt(Dim))
      var lambda = 0.0
      var it = 0
      var converged = false
      while (it < PowerIters && !converged) {
        val cv = Array.tabulate(Dim) { i =>
          var acc = 0.0
          var j = 0
          while (j < Dim) { acc += cov(i)(j) * v(j); j += 1 }
          acc
        }
        val next = math.sqrt(cv.map(x => x * x).sum)
        // λ converges quadratically in the eigengap; iterations here are
        // driver-side matvecs on the 64×64 matrix, so the tolerance can
        // be machine-precision tight
        converged = it > 0 && math.abs(next - lambda) <= 1e-12 * next
        lambda = next
        v = cv.map(_ / lambda)
        it += 1
      }
      val out = v.zipWithIndex
        .map { case (x, j) => (j, x, lambda) }.toSeq
        .toDF("dim", "loading", "lambda")
      out.count()
      graft.Caches.pinDim(out, col("dim"))
    }

  /** Force the one-time PCA fit (Bench line item). */
  def buildPca(s: SparkSession, d: String): Long =
    dominantComponent(s, d).count()

  /** Diagnostic: member count per IVF cluster (probe-cost driver). */
  def clusterSizes(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
    val c = centroids(s, d)
    e.join(broadcast(c), lit(true))
      .withColumn("ccos", VectorOps.cosinePre(
        col("embedding"), col("nrm"), col("c_emb"), col("c_nrm")))
      .groupBy("vec_id")
      .agg(max_by(col("c_id"), col("ccos")).as("c_id"))
      .groupBy("c_id").count()
  }

  /** Rank rows by cosine against a broadcast probe side, keep top-k each. */
  private def topkAgainst(base: DataFrame, probe: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    base.join(broadcast(probe), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", VectorOps.cosinePre(
        col("embedding"), col("nrm"), col("q_emb"), col("q_nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        col("cosine"))
  }

  val defs: Map[String, Q] = Map(
    // Embedding near-dup pairs above a cosine threshold. Brute-force pair
    // enumeration is the oracled baseline; LSH/IVF below are the scale path.
    // Norms are precomputed map-side so each pair costs one dot product.
    "emb_cosine_pairs" -> Q(
      (s, d) => {
        val a = embsFanned(s, d).select(col("vec_id").as("vec_id_a"),
          col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
        val b = embsFanned(s, d).select(col("vec_id").as("vec_id_b"),
          col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
        a.join(b, col("vec_id_a") < col("vec_id_b"))
          .withColumn("cosine", VectorOps.cosinePre(
            col("emb_a"), col("nrm_a"), col("emb_b"), col("nrm_b")))
          .filter(col("cosine") >= CosineThreshold)
          .select("vec_id_a", "vec_id_b", "cosine")
          .orderBy("vec_id_a", "vec_id_b")
      },
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> cast(x as double) * cast(x as double)))) AS nrm
         |  FROM embeddings)
         |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         |  list_sum(list_transform(list_zip(a.embedding, b.embedding),
         |    z -> cast(z[1] as double) * cast(z[2] as double)))
         |    / (a.nrm * b.nrm) AS cosine
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
         |    z -> cast(z[1] as double) * cast(z[2] as double)))
         |    / (a.nrm * b.nrm) >= $CosineThreshold
         |ORDER BY vec_id_a, vec_id_b""".stripMargin),

    // Bucketed cosine near-dup pairs — the 100 TB path for emb_cosine_pairs.
    // Sign-random-projection band keys (one codegen'd map-only pass), an
    // equi-join on band buckets carrying ids only, pair dedup, then exact
    // cosine verification on the candidates. Shuffle is keyed on band
    // buckets, so cost scales with bucket occupancy — never an O(n²)
    // BroadcastNestedLoopJoin (PipelineSpec asserts both the plan shape and
    // ≥95% recall vs the brute-force twin).
    "emb_cosine_lsh" -> Q(
      (s, d) => {
        // vectors ride THROUGH the band join: verify-then-dedup. The
        // earlier dedup-then-verify shape paid a distinct over the full
        // candidate multiset (1.45e8 rows at sf1 — the measured 16.7×
        // superlinear bench item) plus two embedding join-backs; computing
        // the codegen'd dot at each band collision instead is pure map
        // work, and the distinct then runs over only the pairs that PASS
        // the threshold (~3 orders of magnitude fewer rows).
        val keyed = embsFanned(s, d).select(col("vec_id"), col("embedding"),
          col("nrm"),
          explode(HashExprs.srpBands(col("embedding"), Dim, SrpBits, SrpBands))
            .as("bk"))
        keyed
          .join(keyed.select(col("vec_id").as("vec_id_b"),
            col("embedding").as("emb_b"), col("nrm").as("nrm_b"), col("bk")),
            Seq("bk"))
          .filter(col("vec_id") < col("vec_id_b"))
          .withColumn("cosine", VectorOps.cosinePre(
            col("embedding"), col("nrm"), col("emb_b"), col("nrm_b")))
          .filter(col("cosine") >= CosineThreshold)
          .select(col("vec_id").as("vec_id_a"), col("vec_id_b"), col("cosine"))
          .distinct()
          .orderBy("vec_id_a", "vec_id_b")
      },
      None),

    // Brute-force cosine top-k per query: broadcast the (small) query set
    // against the full corpus — one scan, per-group heap via window+filter.
    // Fully deterministic (exact dot products, vec_id tie-break), so the
    // DuckDB re-derivation hash-matches.
    "emb_ann_topk" -> Q(
      (s, d) => topkAgainst(embs(s, d), queries(s, d), TopK)
        .orderBy("q_id", "rank"),
      s"""WITH e AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_sum(list_transform(embedding,
         |      x -> cast(x as double) * cast(x as double)))) AS nrm
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm
         |  FROM e WHERE vec_id % 100 = 0),
         |sc AS (
         |  SELECT q.q_id, e.vec_id AS neighbor_id,
         |    list_sum(list_transform(list_zip(e.embedding, q.q_emb),
         |      z -> cast(z[1] as double) * cast(z[2] as double)))
         |      / (e.nrm * q.q_nrm) AS cosine
         |  FROM e JOIN q ON e.vec_id <> q.q_id),
         |rk AS (
         |  SELECT *, cast(row_number() OVER (PARTITION BY q_id
         |    ORDER BY cosine DESC, neighbor_id) as int) AS rank
         |  FROM sc)
         |SELECT q_id, neighbor_id, rank, cosine FROM rk
         |WHERE rank <= $TopK ORDER BY q_id, rank""".stripMargin),

    // Int8 scalar quantization: per-vector (min, max) affine codes — the
    // 4× storage/bandwidth reduction step before ANN sharding. Map-only at
    // any scale. Quantizes with floor(v + 0.5) (half-up), NOT round():
    // both engines then run the identical IEEE double sequence, so the
    // exploded (vec_id, j, code) rows hash-match the DuckDB unnest oracle
    // bit-for-bit (round()'s midpoint convention differs across engines,
    // and an array<int> column breaks the driver's pandas-based compare).
    // PipelineSpec additionally bounds the reconstruction error at the
    // quantization step size.
    "emb_quantize" -> Q(
      (s, d) => Tables.embeddings(s, d)
        .withColumn("mn", array_min(col("embedding")).cast("double"))
        .withColumn("mx", array_max(col("embedding")).cast("double"))
        .withColumn("scale",
          when(col("mx") > col("mn"), (col("mx") - col("mn")) / 255.0)
            .otherwise(lit(1.0)))
        .select(col("vec_id"), col("mn"), col("scale"),
          posexplode(transform(col("embedding"), x =>
            floor((x.cast("double") - col("mn")) / col("scale") + lit(0.5))
              .cast("int") - 128)))
        .withColumnRenamed("pos", "j")
        .withColumnRenamed("col", "code")
        .orderBy("vec_id", "j"),
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    cast(list_min(embedding) as double) AS mn,
        |    cast(list_max(embedding) as double) AS mx
        |  FROM embeddings),
        |p AS (
        |  SELECT vec_id, embedding, mn,
        |    CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 1.0 END AS scale
        |  FROM e)
        |SELECT vec_id, mn, scale, cast(gs.j - 1 as int) AS j,
        |  cast(floor((cast(embedding[gs.j] as double) - mn) / scale + 0.5)
        |    as int) - 128 AS code
        |FROM p, unnest(generate_series(1, len(embedding))) AS gs(j)
        |ORDER BY vec_id, j""".stripMargin),

    // Map-only; the oracled output surfaces the norm and leading normalized
    // components as scalars (identical double arithmetic both engines).
    "emb_normalize" -> Q(
      (s, d) => Tables.embeddings(s, d)
        .withColumn("nrm", VectorOps.norm(col("embedding")))
        .select(col("vec_id"), col("nrm"),
          (element_at(col("embedding"), 1).cast("double") / col("nrm")).as("u0"),
          (element_at(col("embedding"), 2).cast("double") / col("nrm")).as("u1"),
          (element_at(col("embedding"), 3).cast("double") / col("nrm")).as("u2"))
        .orderBy("vec_id"),
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> cast(x as double) * cast(x as double)))) AS nrm
        |  FROM embeddings)
        |SELECT vec_id, nrm,
        |  cast(embedding[1] as double) / nrm AS u0,
        |  cast(embedding[2] as double) / nrm AS u1,
        |  cast(embedding[3] as double) / nrm AS u2
        |FROM e ORDER BY vec_id""".stripMargin),

    // Matryoshka (MRL) truncation audit (round 15): training stacks
    // serve nested-prefix embeddings — the 16-dim prefix of a 64-dim
    // MRL vector is itself a usable embedding after renormalization.
    // This measures, per vector, how much mass the prefix carries
    // (mass16 = ‖v[:16]‖²/‖v‖² — the decision input for "can we ship
    // the truncated index?") plus leading renormalized components.
    // Map-only, no shuffle but the presentation sort; same exact
    // cross-engine arithmetic as emb_normalize (ordered double
    // accumulation both sides).
    "emb_mrl" -> Q(
      (s, d) => Tables.embeddings(s, d)
        .withColumn("nrm", VectorOps.norm(col("embedding")))
        .withColumn("nrm16", VectorOps.norm(slice(col("embedding"), 1, 16)))
        .select(col("vec_id"), col("nrm"), col("nrm16"),
          round((col("nrm16") * col("nrm16")) / (col("nrm") * col("nrm")),
            6).as("mass16"),
          (element_at(col("embedding"), 1).cast("double") / col("nrm16"))
            .as("t0"),
          (element_at(col("embedding"), 2).cast("double") / col("nrm16"))
            .as("t1"))
        .orderBy("vec_id"),
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding,
        |      x -> cast(x as double) * cast(x as double)))) AS nrm,
        |    sqrt(list_sum(list_transform(embedding[1:16],
        |      x -> cast(x as double) * cast(x as double)))) AS nrm16
        |  FROM embeddings)
        |SELECT vec_id, nrm, nrm16,
        |  round((nrm16 * nrm16) / (nrm * nrm), 6) AS mass16,
        |  cast(embedding[1] as double) / nrm16 AS t0,
        |  cast(embedding[2] as double) / nrm16 AS t1
        |FROM e ORDER BY vec_id""".stripMargin),

    // Per-label embedding statistics: dimension-wise centroid via
    // posexplode + partial-aggregated groupBy — the distributed form of a
    // k-means M-step (no vector ever holds a whole partition's data).
    "emb_label_stats" -> Q(
      (s, d) => Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .filter(col("dim") < 8) // leading dims keep the oracled output compact
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"),
          // round: a double mean's accumulation order varies with
          // partitioning; 6 dp absorbs the ~1e-15 wobble on both engines
          round(avg(col("v").cast("double")), 6).as("mean_v"),
          min(col("v").cast("double")).as("min_v"),
          max(col("v").cast("double")).as("max_v"))
        .orderBy("label", "dim"),
      """SELECT label, cast(t.i - 1 as int) AS dim, count(*) AS n,
        |  round(avg(cast(embedding[t.i] as double)), 6) AS mean_v,
        |  min(cast(embedding[t.i] as double)) AS min_v,
        |  max(cast(embedding[t.i] as double)) AS max_v
        |FROM embeddings, generate_series(1, 8) AS t(i)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin),

    // IVF-style ANN: assign every vector to its nearest centroid (broadcast,
    // map-only), probe the top `Probes` centroids per query, rank only the
    // probed clusters' members. Scales as corpus/n_clusters per query.
    "emb_ann_ivf" -> Q(
      (s, d) => {
        val c = centroids(s, d)
        // nearest-centroid assignment: broadcast cross + max_by aggregation —
        // the n×C expansion collapses map-side (partial agg), so the shuffle
        // carries n rows, not n×C; the assignment table is the cached
        // stored index (shared with emb_semantic_dedup)
        val assigned = ivfAssigned(s, d)
        val wProbe = Window.partitionBy("q_id").orderBy(col("qcos").desc, col("c_id"))
        val probed = queries(s, d).join(broadcast(c), lit(true))
          .withColumn("qcos", VectorOps.cosinePre(
            col("q_emb"), col("q_nrm"), col("c_emb"), col("c_nrm")))
          .withColumn("prank", row_number().over(wProbe))
          .filter(col("prank") <= Probes)
          .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c_id"))
        val wTop = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
        assigned.join(broadcast(probed), Seq("c_id"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cosine", VectorOps.cosinePre(
            col("embedding"), col("nrm"), col("q_emb"), col("q_nrm")))
          .withColumn("rank", row_number().over(wTop))
          .filter(col("rank") <= TopK)
          .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
            col("cosine"))
          .orderBy("q_id", "rank")
      },
      None),

    // Dominant principal component (see dominantComponent above): the
    // dimensionality-reduction fit step of an embedding pipeline, run as
    // iterative distributed matvecs. Rows-only; PipelineSpec checks the
    // eigenpair residual against a driver-side covariance and the
    // eigenvalue against a long-run reference iteration.
    "emb_power_iteration" -> Q(
      (s, d) => dominantComponent(s, d).orderBy("dim"),
      None),

    // SemDeDup (semantic deduplication, Abbas et al. 2023): assign every
    // vector to its IVF centroid, then score pairs ONLY within a cluster —
    // the clustering bounds pair cost by cluster occupancy instead of
    // O(n²), which is the whole trick at 100 TB. A vector is dropped when
    // any lower-id vector in its cluster is within the cosine threshold;
    // min-id-wins is deterministic and guarantees no two KEPT vectors in
    // one cluster are near-dups (a higher-id member of such a pair would
    // have been dropped by the lower one). Rows-only: the k-means fit has
    // no SQL analogue; PipelineSpec proves both invariants directly.
    "emb_semantic_dedup" -> Q(
      (s, d) => {
        // cached IVF assignment: this frame is referenced three times
        // (both pair sides + the output) — uncached, each reference
        // re-ran the n×C broadcast-cosine pass
        val assigned = ivfAssigned(s, d)
          .withColumnRenamed("c_id", "cluster_id")
        val lhs = assigned.select(col("cluster_id"), col("vec_id"),
          col("embedding"), col("nrm"))
        val rhs = assigned.select(col("cluster_id"),
          col("vec_id").as("b_id"), col("embedding").as("b_emb"),
          col("nrm").as("b_nrm"))
        val dropped = lhs.join(rhs, Seq("cluster_id"))
          .filter(col("b_id") < col("vec_id"))
          .filter(VectorOps.cosinePre(col("embedding"), col("nrm"),
            col("b_emb"), col("b_nrm")) >= CosineThreshold)
          .select("vec_id").distinct()
          .withColumn("is_dropped", lit(true))
        assigned.join(dropped, Seq("vec_id"), "left")
          .select(col("vec_id"), col("cluster_id"),
            coalesce(col("is_dropped"), lit(false)).as("is_dropped"))
          .orderBy("vec_id")
      },
      None),

    // PQ code assignment: every (vector, subspace) pair gets the id of its
    // nearest codeword — one broadcast join + one keyed agg, map-shaped at
    // any corpus size since the codebook is PqM·PqK rows. Rows-only (the
    // k-means fit has no SQL analogue); PipelineSpec re-derives the argmin
    // on a driver sample and bounds reconstruction error against the
    // one-codeword baseline.
    "emb_pq_codes" -> Q(
      (s, d) => pqCodes(s, d)
        .select(col("vec_id"), col("m").cast("long").as("m"),
          col("code").cast("long").as("code"))
        .orderBy("vec_id", "m"),
      None),

    // ADC-shortlist-then-rerank top-k over the PQ index — the production
    // PQ search (FAISS's refine pattern): the query precomputes a
    // per-subspace distance table to every codeword (|queries|·PqM·PqK
    // rows — always broadcastable), the corpus scan touches ONLY the
    // 5-bit codes (one broadcast join + a (q, vec) partial-agg sum, never
    // the floats), and only the PqShortK ADC survivors pay an exact-L2
    // rerank against their stored vectors. Compute shape at 100 TB: the
    // heavy pass reads ~51× fewer bytes than a float scan; the rerank
    // join is |queries|·PqShortK rows. Rows-only; PipelineSpec measures
    // final recall@k against the exact ground truth.
    "emb_ann_pq" -> Q(
      (s, d) => {
        val cb = pqCodebook(s, d)
          .withColumn("cwn2", VectorOps.dot(col("cw"), col("cw")))
        val qsub = subvectors(queries(s, d)
            .select(col("q_id").as("vec_id"), col("q_emb").as("embedding")))
          .select(col("vec_id").as("q_id"), col("m"), col("sv").as("qsv"))
        // |q−cw|² per (query, subspace, codeword); the |q_sv|² term is
        // constant per (q, m) so ADC ranks don't need it — kept so ad2 is
        // a true squared distance
        val dtab = qsub.join(cb, Seq("m"))
          .select(col("q_id"), col("m"), col("code"),
            (VectorOps.dot(col("qsv"), col("qsv")) +
              d2(col("qsv"), col("cw"), col("cwn2"))).as("dpart"))
        val wShort = Window.partitionBy("q_id")
          .orderBy(col("ad2").asc, col("vec_id"))
        val shortlist = pqCodes(s, d).join(broadcast(dtab), Seq("m", "code"))
          .groupBy("q_id", "vec_id")
          .agg(sum(col("dpart")).as("ad2"))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("srank", row_number().over(wShort))
          .filter(col("srank") <= PqShortK)
          .select(col("q_id"), col("vec_id"))
        // exact rerank of the shortlist only
        val wFinal = Window.partitionBy("q_id")
          .orderBy(col("d2").asc, col("vec_id"))
        shortlist
          .join(embs(s, d).select(col("vec_id"), col("embedding")), "vec_id")
          .join(broadcast(queries(s, d).select(col("q_id"), col("q_emb"))), "q_id")
          .withColumn("d2",
            VectorOps.dot(col("embedding"), col("embedding")) +
              VectorOps.dot(col("q_emb"), col("q_emb")) -
              lit(2.0) * VectorOps.dot(col("embedding"), col("q_emb")))
          .withColumn("rank", row_number().over(wFinal))
          .filter(col("rank") <= TopK)
          .select(col("q_id"), col("vec_id").as("neighbor_id"),
            col("rank").cast("long").as("rank"), round(col("d2"), 6).as("d2"))
          .orderBy("q_id", "rank")
      },
      None)
  )
}
