package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextOps, VectorOps}

/** Semantics checks for the training-data pipeline (SURVEY §2.D) — these
  * cover the rows-only operators the DuckDB oracle can't express.
  */
class PipelineSpec extends SparkSpec {
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("doc_dedup_exact: canonical ids are group minima and flags consistent") {
    val d = run("doc_dedup_exact").collect()
    assert(d.nonEmpty)
    d.foreach { r =>
      assert(r.getAs[Long]("canonical_doc_id") <= r.getAs[Long]("doc_id"))
      assert(r.getAs[Boolean]("is_dup") ==
        (r.getAs[Long]("doc_id") != r.getAs[Long]("canonical_doc_id")))
    }
  }

  test("doc_minhash_lsh estimates track exact Jaccard") {
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shingles(col("toks")).as("sh"))
    val est = run("doc_minhash_lsh").limit(500)
    val joined = est
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("exact",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .select("est_jaccard", "exact").collect()
    assert(joined.nonEmpty)
    val mae = joined.map(r => math.abs(r.getDouble(0) - r.getDouble(1))).sum / joined.length
    assert(mae < 0.2, s"minhash mean abs error $mae")
  }

  test("doc_simhash pairs are hamming<=3 and symmetric-free") {
    val p = run("doc_simhash").collect()
    assert(p.nonEmpty)
    p.foreach { r =>
      assert(r.getAs[Int]("hamming") <= 3)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("doc_ngram_jaccard only emits pairs above threshold") {
    val j = run("doc_ngram_jaccard").agg(min("jaccard")).collect()(0).getDouble(0)
    assert(j >= operators.Dedup.JaccardThreshold)
  }

  test("emb_ann_topk rank-1 matches brute-force argmax for each query") {
    val e = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val top1 = run("emb_ann_topk").filter(col("rank") === 1).collect()
    assert(top1.nonEmpty)
    top1.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val got = r.getAs[Long]("neighbor_id")
      val best = e.filter(_._1 != q).maxBy { case (_, v) => cos(e(q), v) }._1
      assert(got == best, s"query $q: got $got want $best")
    }
  }

  test("emb_ann_ivf achieves high recall@10 against brute force") {
    val exact = run("emb_ann_topk").select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = run("emb_ann_ivf").select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    // Lloyd-refined centroids measure 0.88 recall@10 on sf0.01 at 2 probes
    // (~24% of the corpus scanned per query); see Similarity.centroids for
    // the measured fit-vs-sample tradeoff on this corpus
    assert(recall >= 0.8, s"IVF recall@10 $recall")
  }

  test("emb_cosine_lsh recalls brute-force pairs without a nested-loop join") {
    def pairs(name: String) = run(name).select("vec_id_a", "vec_id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("emb_cosine_pairs")
    val lsh = pairs("emb_cosine_lsh")
    // exact-cosine verification stage → candidates never over-report
    assert(lsh.subsetOf(exact))
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    assert(recall >= 0.95, s"SRP-LSH recall $recall")
    // the scale path must be a bucketed equi-join, not an O(n²) loop
    val plan = SparkEntry.queries("emb_cosine_lsh")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested-loop in scale path")
  }

  test("nearDupPairs finds planted twins with hard candidate pruning") {
    // plant one cosine≈0.9 twin per 10th vector (ScaleUp's plant transform:
    // sign-flip ~1/20 of components), then require the high-threshold SRP
    // blocking to recover every twin while generating candidate volume far
    // below n²/2 — the planted-recall harness for the operating point a
    // semantic-dedup pipeline actually runs at
    val base = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val planted = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          when(pmod(xxhash64(col("vec_id") + 1000000L, j), lit(20)) === 0, -x)
            .otherwise(x)).as("embedding"))
    val corpus = base.unionByName(planted)
    val n = corpus.count()
    val found = operators.Similarity.nearDupPairs(corpus)
      .select("vec_id_a", "vec_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth = planted pairs that actually qualify at the threshold
    // (the flipped-energy fraction varies per vector, so a minority of
    // twins land below 0.85 cosine and are correctly NOT near-dups)
    val emb = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val truth = planted.select(col("vec_id") - 1000000L, col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) =>
        cos(emb(a), emb(b)) >= operators.Similarity.NearDupThreshold }
      .toSet
    assert(truth.nonEmpty)
    val recall = truth.intersect(found).size.toDouble / truth.size
    assert(recall >= 0.95, s"planted-twin recall@threshold $recall")
    // verified output stays near the planted set: the blocking + exact
    // verify must not admit the near-orthogonal background
    assert(found.size <= truth.size * 3,
      s"near-dup output ${found.size} vs ${truth.size} planted")
    assert(n * (n - 1) / 2 > found.size * 100L)
  }

  test("emb_cosine_pairs matches a driver-side recompute") {
    val rows = run("emb_cosine_pairs").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("cosine")) <= 1.0))
    assert(rows.forall(_.getAs[Double]("cosine") >= operators.Similarity.CosineThreshold))
  }

  test("doc_fingerprint is deterministic and dense") {
    val a = run("doc_fingerprint")
    val n1 = a.count()
    assert(n1 > 0)
    assert(n1 == run("doc_fingerprint").count())
    // every document yields at least one fingerprint
    assert(a.select("doc_id").distinct().count() ==
      Tables.documents(spark, sf).count())
  }

  test("doc_fingerprint_pairs: canonical order, floor respected, catches word-level near-dups") {
    val pairs = run("doc_fingerprint_pairs").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("n_shared") >= operators.Dedup.MinSharedFp)
    }
    // Cross-modality recall: pairs that are word-shingle near-dups
    // (exact Jaccard >= 0.8) share long char runs, so the char-level
    // winnowing index must rediscover nearly all of them.
    val wordDups = run("doc_ngram_jaccard").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fpPairs = pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val recall = wordDups.intersect(fpPairs).size.toDouble / wordDups.size
    assert(recall >= 0.9, s"fingerprint-pair recall of word near-dups: $recall")
  }

  test("doc_dedup_clusters matches a driver-side union-find over the same edges") {
    val exact = run("doc_dedup_exact").filter(col("is_dup"))
      .select("canonical_doc_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val near = run("doc_ngram_jaccard").select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    (exact ++ near).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = run("doc_dedup_clusters").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got.nonEmpty)
    got.foreach { case (doc, cl) =>
      assert(cl == find(doc), s"doc $doc: cluster $cl want ${find(doc)}")
    }
    // canonical flag marks exactly the cluster-min docs
    run("doc_dedup_clusters").collect().foreach { r =>
      assert(r.getAs[Boolean]("is_canonical") ==
        (r.getAs[Long]("doc_id") == r.getAs[Long]("cluster_id")))
    }
  }

  test("doc_cc_bigstar labels are identical to the min-label propagation") {
    val minLabel = run("doc_dedup_clusters").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Boolean]("is_canonical"))).toSet
    val bigStar = run("doc_cc_bigstar").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Boolean]("is_canonical"))).toSet
    assert(bigStar.nonEmpty && bigStar == minLabel)
  }

  test("doc_containment dominates Jaccard and is exact on exact-dup pairs") {
    val rows = run("doc_containment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ca, cb, j) = (r.getAs[Double]("containment_a"),
        r.getAs[Double]("containment_b"), r.getAs[Double]("jaccard"))
      assert(ca >= j - 1e-12 && cb >= j - 1e-12 && ca <= 1.0 && cb <= 1.0)
    }
    // exact duplicates (when this sf has any) must score containment 1
    // in both directions
    val exact = run("doc_dedup_exact").filter(col("is_dup"))
      .select(col("canonical_doc_id"), col("doc_id")).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    val byPair = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
      (r.getAs[Double]("containment_a"), r.getAs[Double]("containment_b"))).toMap
    exact.filter(byPair.contains).foreach { p =>
      val (ca, cb) = byPair(p)
      assert(ca == 1.0 && cb == 1.0, s"$p: $ca/$cb")
    }
    // and identical shingle sets (jaccard 1) imply containment 1
    rows.filter(_.getAs[Double]("jaccard") >= 1.0).foreach { r =>
      assert(r.getAs[Double]("containment_a") == 1.0 &&
        r.getAs[Double]("containment_b") == 1.0)
    }
  }

  test("hash primitives hold their invariants on seeded random text (property)") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo", "fox",
      "golf", "hotel", "india", "jul", "kilo", "lima", "mike", "nov")
    val texts = (1 to 100).map { i =>
      (i.toLong, (1 to (3 + rng.nextInt(40)))
        .map(_ => words(rng.nextInt(words.size))).mkString(" "))
    }
    val df = texts.toDF("doc_id", "text")
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("sh", TextOps.shingles(col("toks")))
      .withColumn("hs", TextOps.kgramHashes(col("text"), k = 8))
      .withColumn("fp", TextOps.winnowFromHashes(col("hs"), w = 4))
      .withColumn("sig", TextOps.minhashSignature(col("sh"), 32))
      .withColumn("sim", TextOps.simhash64(col("toks")))
      .collect()
    df.foreach { r =>
      val hs = r.getSeq[Long](r.fieldIndex("hs")).toSet
      val fp = r.getSeq[Long](r.fieldIndex("fp"))
      // winnowing: fingerprints are a nonempty subset of the k-gram hashes
      assert(fp.nonEmpty && fp.toSet.subsetOf(hs), s"doc ${r.getLong(0)}")
      // and distinct (array_distinct in the definition)
      assert(fp.distinct.size == fp.size)
      // minhash: fixed signature length, defined for nonempty shingle sets
      val sh = r.getSeq[String](r.fieldIndex("sh"))
      val sig = r.getSeq[Long](r.fieldIndex("sig"))
      if (sh.nonEmpty) assert(sig.size == 32)
    }
    // identical texts hash identically; different texts (almost surely)
    // differ in simhash OR shingles
    val simIdx = df.head.fieldIndex("sim")
    val sigIdx = df.head.fieldIndex("sig")
    df.groupBy(_.getString(1)).values.filter(_.size > 1).foreach { rows =>
      assert(rows.map(_.getLong(simIdx)).toSet.size == 1)
      assert(rows.map(_.getSeq[Long](sigIdx).toList).toSet.size == 1)
    }
  }

  test("doc_containment_lsh: exact precision, high recall vs brute force") {
    val got = run("doc_containment_lsh").collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("containment"))).toMap
    // brute-force all-pairs containment over the same hashed shingle sets
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(transform(
          TextOps.shingles(TextOps.tokens(col("text"))),
          x => xxhash64(x))).as("sh"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toSet)
      .filter(_._2.nonEmpty)
    val brute = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      c = sa.intersect(sb).size.toDouble / math.min(sa.size, sb.size)
      if c >= operators.Dedup.ContainmentThreshold
    } yield (a, b) -> c).toMap
    assert(brute.nonEmpty && got.nonEmpty)
    // precision is exact: every emitted pair is a true containment pair
    got.foreach { case (p, c) =>
      assert(brute.contains(p) && math.abs(brute(p) - c) < 1e-9, s"$p")
    }
    // rare-shingle blocking recall
    val recall = brute.keySet.intersect(got.keySet).size.toDouble / brute.size
    assert(recall >= 0.8, s"containment recall $recall")
  }

  test("emb_power_iteration converges to the dominant covariance eigenpair") {
    val got = run("emb_power_iteration").orderBy("dim").collect()
    val v = got.map(_.getAs[Double]("loading"))
    val lambda = got.head.getAs[Double]("lambda")
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
    // driver-side covariance of the same corpus
    val X = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = X.length
    val dim = X(0).length
    val mu = Array.tabulate(dim)(j => X.map(_(j)).sum / n)
    val C = Array.tabulate(dim, dim)((i, j) =>
      X.map(x => (x(i) - mu(i)) * (x(j) - mu(j))).sum / n)
    def matvec(w: Array[Double]) =
      Array.tabulate(dim)(i => (0 until dim).map(j => C(i)(j) * w(j)).sum)
    // eigenpair residual: ||Cv − λv|| small relative to λ
    val cv = matvec(v)
    val resid = math.sqrt(
      cv.zip(v).map { case (a, b) => val r = a - lambda * b; r * r }.sum)
    assert(resid <= 0.05 * lambda, s"residual $resid vs lambda $lambda")
    // λ matches a long-run driver reference iteration
    var w = Array.fill(dim)(1.0 / math.sqrt(dim))
    var l1 = 0.0
    for (_ <- 1 to 500) {
      val cw = matvec(w)
      l1 = math.sqrt(cw.map(x => x * x).sum)
      w = cw.map(_ / l1)
    }
    assert(math.abs(lambda - l1) <= 0.02 * l1, s"$lambda vs reference $l1")
  }

  test("doc_heavy_hitters equals the exact full-shuffle top-k") {
    val approx = run("doc_heavy_hitters").collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("n"))).toSeq
    val exact = Tables.documents(spark, sf)
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(20).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("n"))).toSeq
    assert(approx == exact && approx.size == 20)
  }

  test("emb_quantize codes reconstruct within the quantization step") {
    val rows = run("emb_quantize").collect()
    val orig = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray).toMap
    assert(rows.nonEmpty)
    // exploded shape: one (vec_id, j, code) row per element
    assert(rows.length == orig.values.map(_.length).sum)
    rows.foreach { r =>
      val (mn, scale) = (r.getAs[Double]("mn"), r.getAs[Double]("scale"))
      val c = r.getAs[Int]("code")
      val x = orig(r.getAs[Long]("vec_id"))(r.getAs[Int]("j"))
      assert(c >= -128 && c <= 127)
      val dequant = (c + 128) * scale + mn
      assert(math.abs(dequant - x) <= scale / 2 + 1e-9,
        s"err ${math.abs(dequant - x)} vs step $scale")
    }
  }

  test("emb_pq_codes: assignments are argmin codewords and beat the 1-codeword baseline") {
    val codes = run("emb_pq_codes").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("m")) -> r.getAs[Long]("code"))
      .toMap
    val embAll = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray).toMap
    val M = operators.Similarity.PqM
    val sd = 64 / M
    assert(codes.size == embAll.size * M)
    assert(codes.values.forall(c => c >= 0 && c < operators.Similarity.PqK))
    val cb = operators.Similarity.pqCodebook(spark, sf).collect()
      .map(r => (r.getAs[Int]("m"), r.getAs[Int]("code")) ->
        r.getSeq[Float](r.fieldIndex("cw")).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def sub(v: Array[Double], m: Int): Array[Double] = v.slice(m * sd, m * sd + sd)
    // argmin re-derivation on a deterministic sample
    embAll.keys.toSeq.sorted.take(25).foreach { id =>
      (0 until M).foreach { m =>
        val sv = sub(embAll(id), m)
        val best = cb.collect { case ((mm, c), cw) if mm == m => c -> l2(sv, cw) }
          .minBy { case (c, dd) => (dd, c) }._1
        assert(codes((id, m.toLong)) == best, s"vec $id subspace $m")
      }
    }
    // reconstruction beats quantizing every subvector to its subspace mean
    val subAll = embAll.toSeq.flatMap { case (id, v) =>
      (0 until M).map(m => (m, sub(v, m))) }
    val meanBySub = subAll.groupBy(_._1).map { case (m, xs) =>
      val n = xs.size
      m -> xs.map(_._2).transpose.map(_.sum / n).toArray }
    val pqErr = embAll.keys.toSeq.flatMap { id =>
      (0 until M).map { m =>
        l2(sub(embAll(id), m), cb((m, codes((id, m.toLong)).toInt))) } }.sum
    val baseErr = subAll.map { case (m, sv) => l2(sv, meanBySub(m)) }.sum
    assert(pqErr < baseErr * 0.9, s"pq $pqErr vs baseline $baseErr")
  }

  test("emb_ann_pq: ADC search recalls the exact L2 neighbors") {
    val pq = run("emb_ann_pq").collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val embAll = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val k = operators.Similarity.TopK
    assert(pq.nonEmpty && pq.values.forall(_.size == k))
    val recalls = pq.map { case (q, approx) =>
      val exact = embAll.toSeq.filter(_._1 != q)
        .map { case (id, v) => id -> l2(embAll(q), v) }
        .sortBy { case (id, dd) => (dd, id) }.take(k).map(_._1).toSet
      approx.intersect(exact).size.toDouble / k
    }
    val avg = recalls.sum / recalls.size
    // ADC-shortlist(100) + exact rerank measured 0.90 recall@10 on this
    // corpus (a weak-structure near-isotropic case); 0.75 leaves margin
    // for seed-stride variation while still proving the shortlist carries
    // the true neighborhood
    assert(avg >= 0.75, s"avg recall@$k $avg (${recalls.toSeq.sorted})")
  }

  test("emb_semantic_dedup: kept vectors are pairwise distinct, drops are justified") {
    val rows = run("emb_semantic_dedup").collect()
    val embAll = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray).toMap
    assert(rows.length == embAll.size)
    assert(rows.exists(_.getAs[Boolean]("is_dropped")),
      "threshold never fired — the spec would be vacuous")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val t = operators.Similarity.CosineThreshold
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (_, cl) =>
      val (dropped, kept) = cl.partition(_.getAs[Boolean]("is_dropped"))
      val keptIds = kept.map(_.getAs[Long]("vec_id")).sorted
      // invariant 1: no two KEPT vectors in one cluster are near-dups
      for (i <- keptIds.indices; j <- 0 until i)
        assert(cos(embAll(keptIds(i)), embAll(keptIds(j))) < t,
          s"kept near-dup pair ${keptIds(j)},${keptIds(i)}")
      // invariant 2: every drop is justified by a lower-id cluster member
      val ids = cl.map(_.getAs[Long]("vec_id"))
      dropped.map(_.getAs[Long]("vec_id")).foreach { d =>
        assert(ids.exists(o => o < d && cos(embAll(o), embAll(d)) >= t),
          s"unjustified drop $d")
      }
    }
  }

  test("doc_importance_weight ranks target-language docs above the rest") {
    val rows = run("doc_importance_weight").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val langOf = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val (en, rest) = rows.partition(r => langOf(r.getAs[Long]("doc_id")) == "en")
    def mean(xs: Array[Double]) = xs.sum / xs.length
    // the LLR is trained with lang='en' as the target: en docs must score
    // higher on average than non-target docs (the resampling signal)
    assert(mean(en.map(_.getAs[Double]("llr_per_token"))) >
      mean(rest.map(_.getAs[Double]("llr_per_token"))))
  }

  test("doc_domain_mix weights normalize and flatten the distribution") {
    val rows = run("doc_domain_mix").collect()
    val (ps, ws) = (rows.map(_.getAs[Double]("p")), rows.map(_.getAs[Double]("w")))
    assert(math.abs(ps.sum - 1.0) < 1e-3 && math.abs(ws.sum - 1.0) < 1e-3)
    // τ < 1 flattens: the largest source is down-sampled, the smallest
    // boosted (factor = w/p below/above 1 respectively)
    val byP = rows.sortBy(_.getAs[Double]("p"))
    assert(byP.last.getAs[Double]("factor") < 1.0)
    assert(byP.head.getAs[Double]("factor") > 1.0)
  }

  test("doc_ccnet_bucket tertiles are balanced within each language") {
    val rows = run("doc_ccnet_bucket").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val n = rs.length
      def ofT(t: Long) = rs.filter(_.getAs[Long]("tertile") == t)
      val (h, m, t) = (ofT(1L), ofT(2L), ofT(3L))
      // threshold semantics: t1 is the ceil(n/3)-th smallest micro-NLL,
      // so head covers AT LEAST the first tertile (ties spill downward
      // into head/middle, never upward into tail)
      assert(h.length >= (n + 2) / 3, s"$lang: head=${h.length} of $n")
      assert(h.length + m.length >= (2 * n + 2) / 3,
        s"$lang: head+middle=${h.length + m.length} of $n")
      // buckets are value-monotone: every head NLL <= every middle NLL
      // <= every tail NLL (the property ntile only gives via its sort)
      def nlls(xs: Array[org.apache.spark.sql.Row]) =
        xs.map(_.getAs[Double]("avg_nll"))
      if (h.nonEmpty && m.nonEmpty) assert(nlls(h).max <= nlls(m).min)
      if (m.nonEmpty && t.nonEmpty) assert(nlls(m).max <= nlls(t).min)
      if (h.nonEmpty && t.nonEmpty) assert(nlls(h).max <= nlls(t).min)
      // with all-distinct NLLs the thresholds reproduce ntile's exact
      // balance (sizes differ by at most 1)
      if (rs.map(_.getAs[Double]("avg_nll")).distinct.length == n) {
        val sizes = Seq(h.length, m.length, t.length)
        assert(sizes.max - sizes.min <= 1, s"$lang: $sizes")
      }
    }
  }

  test("doc_corpus_dedup retention is consistent with the cluster resolution") {
    val stats = run("doc_corpus_dedup").collect()
    val cl = run("doc_dedup_clusters")
    assert(stats.map(_.getAs[Long]("n_docs")).sum == cl.count())
    assert(stats.map(_.getAs[Long]("n_kept")).sum ==
      cl.filter(col("is_canonical")).count())
    stats.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("retention") <= 1.0)
    }
  }

  test("doc_lang_id predicts only known languages") {
    val langs = Set("en", "de", "es", "fr", "zh", "und")
    assert(run("doc_lang_id").collect().forall(r => langs(r.getAs[String]("pred_lang"))))
  }

  test("mm_decode_pipeline: schema, determinism, non-degenerate features") {
    val m = run("mm_decode_pipeline")
    assert(m.columns.toSeq == Seq("doc_id", "media_format", "n_bytes",
      "width", "height", "f0", "f1", "feature_sum"))
    val rows = m.collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    assert(rows.forall(_.getAs[Double]("feature_sum") > 0))
    val again = run("mm_decode_pipeline").collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("mm_frame_sample keeps every stride-th frame and is deterministic") {
    import operators.Multimodal.{FrameBytes, FrameStride}
    val rows = run("mm_frame_sample").collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    // frame arithmetic runs over the PAYLOAD (container header + body),
    // so expectations derive from the media table's own byte lengths
    val lens = operators.Multimodal.mediaTable(spark, sf)
      .select(col("doc_id"), length(col("payload")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (doc, fr) =>
      val nFrames = (lens(doc) - 1) / FrameBytes + 1
      val expected = (0L until nFrames by FrameStride.toLong).toSeq
      assert(fr.map(_.getAs[Long]("frame_idx")).sorted.toSeq == expected)
      // all but possibly the tail frame are full-size
      assert(fr.count(_.getAs[Int]("frame_bytes") < FrameBytes) <= 1)
    }
    val again = run("mm_frame_sample").collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("Caches.release unpersists session-scoped materialized tables and rebuilds on demand") {
    run("doc_minhash_lsh").count() // force the LSH candidate materialization
    val before = spark.sparkContext.getPersistentRDDs.size
    assert(before > 0)
    Caches.release(spark)
    assert(spark.sparkContext.getPersistentRDDs.size < before)
    // transparent rebuild after release
    assert(run("doc_minhash_lsh").count() > 0)
  }

  test("winnow fingerprints of identical text are identical") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
      .select(col("id"), TextOps.winnow(col("text"), 8, 4).as("fp"))
    val fps = df.collect().map(_.getSeq[Long](1).toList)
    assert(fps(0) == fps(1) && fps(0).nonEmpty)
  }

  test("incremental IVF/PQ index: cdf-fed drops stay map-only, drift refits, recall@10 matches a full rebuild, deletes ride the feed") {
    import java.io.File
    import graft.operators.Similarity
    import graft.sources.ManifestTable
    import graft.sources.ManifestTable.TableBatch
    import graft.streaming.IncrementalIndex
    def tmp(p: String): String =
      java.nio.file.Files.createTempDirectory(p).resolve("t").toString
    val t = ManifestTable.DefaultTable
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val n = e.count()
    val drop1 = e.filter(col("vec_id") % 2 === 0)
    val drop2 = e.filter(col("vec_id") % 2 =!= 0)

    // two embedding drops arrive through a change-feed source table; the
    // maintainer drains the feed with the SAME checkpoint both times
    val src = tmp("graft_vecsrc")
    val idx = tmp("graft_vecidx")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_vecidx_ckpt")
      .toString
    ManifestTable.mergeBatch(new File(src), "w", 0L, Seq(
      TableBatch(t, drop1, Seq("vec_id"), 4, changeFeed = true)))
    IncrementalIndex.sync(spark, src, idx, ckpt)
    val fit1 = IncrementalIndex.fitCount(spark, idx)
    assert(fit1 == drop1.count(), s"first drop should fit: $fit1")

    ManifestTable.mergeBatch(new File(src), "w", 1L, Seq(
      TableBatch(t, drop2, Seq("vec_id"), 4, changeFeed = true)))
    IncrementalIndex.sync(spark, src, idx, ckpt)
    val fit2 = IncrementalIndex.fitCount(spark, idx)
    assert(fit2 == n, s"doubling the corpus must trigger the drift refit: $fit2")

    // one-shot rebuild over the identical corpus: the refit trained on
    // the same full corpus, so the two indexes must search alike
    val idx2 = tmp("graft_vecidx2")
    IncrementalIndex.ingest(spark, new File(idx2), 0L, e)

    val probes = e.filter(col("vec_id") % 100 === 0)
    val all = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val truth = probes.select("vec_id").collect().map(_.getLong(0)).flatMap { q =>
      all.toSeq.filter(_._1 != q)
        .sortBy { case (id, v) => (-cos(all(q), v), id) }
        .take(10).map { case (id, _) => (q, id) }
    }.toSet
    def recall(root: String): Double = {
      val got = IncrementalIndex.annTopK(spark, root, probes, k = 10,
        nProbes = 8)
        .select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.intersect(got).size.toDouble / truth.size
    }
    val rInc = recall(idx)
    val rFull = recall(idx2)
    assert(math.abs(rInc - rFull) <= 0.02,
      s"incrementally maintained recall $rInc diverged from rebuild $rFull")
    // 8 of ~√n cells ≈ a third of the corpus scanned — the recall/scan
    // point this corpus's cluster spread supports; the CONTRACT under
    // test is the equality above, recall itself is tunable via nProbes
    assert(rInc >= 0.6, s"IVF recall@10 through the maintained index: $rInc")

    // the PQ half is maintained too: every vector carries its PqM codes
    assert(ManifestTable.readTable(spark, idx,
      table = IncrementalIndex.CodesTable).count() == n * Similarity.PqM)

    // deletes ride the feed: drop the probes' ids, drain, and the index
    // must neither store nor ever return them
    val delIds = probes.select("vec_id")
    ManifestTable.mergeBatch(new File(src), "w", 2L, Seq(
      TableBatch(t, drop2.limit(0), Seq("vec_id"), 4,
        deleteKeys = Some(delIds), changeFeed = true)))
    IncrementalIndex.sync(spark, src, idx, ckpt)
    val deleted = delIds.collect().map(_.getLong(0)).toSet
    assert(ManifestTable.readTable(spark, idx,
      table = IncrementalIndex.VectorsTable)
      .filter(col("vec_id").isin(deleted.toSeq: _*)).count() == 0L)
    val others = e.filter(col("vec_id") % 100 === 50)
    val post = IncrementalIndex.annTopK(spark, idx, others, k = 10,
      nProbes = 8).select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(post.nonEmpty && post.intersect(deleted).isEmpty,
      "deleted vectors still surface as neighbors")
  }

  test("doc_bpe_train learns exactly the merges an independent sequential BPE trainer learns") {
    // independent reference: plain-Scala Sennrich BPE over the same word
    // frequencies — argmax with (freq desc, left, right) tie-break, greedy
    // left-to-right merge application (a fresh symbol never re-merges
    // within its own round)
    def refTrain(wordFreq: Map[String, Long], maxMerges: Int,
        minFreq: Long): Seq[(Int, String, String, String, Long)] = {
      var words: Seq[(Vector[String], Long)] =
        wordFreq.toSeq.map { case (w, f) => w.map(_.toString).toVector -> f }
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, String, Long)]
      var rank = 0
      var done = false
      while (rank < maxMerges && !done) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        words.foreach { case (syms, f) =>
          syms.indices.dropRight(1).foreach { i =>
            val k = (syms(i), syms(i + 1))
            pc(k) = pc.getOrElse(k, 0L) + f
          }
        }
        val best = pc.toSeq.sortBy { case ((l, r), f) => (-f, l, r) }.headOption
        best match {
          case Some(((l, r), f)) if f >= minFreq =>
            out += ((rank, l, r, l + r, f))
            words = words.map { case (syms, wf) =>
              val acc = scala.collection.mutable.ArrayBuffer.empty[String]
              syms.foreach { x =>
                if (acc.nonEmpty && acc.last == l && x == r)
                  acc(acc.length - 1) = l + r
                else acc += x
              }
              acc.toVector -> wf
            }
            rank += 1
          case _ => done = true
        }
      }
      out.toSeq
    }

    val wordFreq = Tables.documents(spark, sf)
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = refTrain(wordFreq, maxMerges = 40, minFreq = 2L)
    assert(expected.size > 10, "corpus too degenerate to train on")

    val learned = run("doc_bpe_train").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_freq"))).toSeq
    assert(learned == expected,
      s"distributed trainer diverged from reference at " +
        s"${learned.zip(expected).indexWhere { case (a, b) => a != b }}")
  }
}
