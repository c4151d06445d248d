package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-margin data generator: replicates an sf dir K× with shifted keys so
  * the heavy pipelines can be measured one decade above the bench scale
  * (SURVEY "BENCH_sf1" section — the empirical check that the cost curves
  * are near-linear, not just linear-by-plan-inspection).
  *
  * Replication must not distort the similarity structure the dedup/ANN
  * operators key on — K exact copies of every document would turn the whole
  * corpus into one near-dup blob and measure a pathology, not scale. So:
  *   - documents: per-replica vowel permutation (`translate`) rewrites most
  *     shingles — cross-replica Jaccard ≈ 0 — while preserving length,
  *     whitespace, and within-replica dup structure exactly;
  *   - embeddings: a hash-seeded ~half of each vector's components flip
  *     sign per replica, which keeps the norm but drives expected cosine
  *     between any two replicas of the same vector to ≈ 0 — far below the
  *     0.35 pair threshold (flipping a small fixed fraction f only lowers
  *     cosine to 1−2f, which at f=1/7 left every replica pair a near-dup
  *     and measured a 45×-per-vector pair pathology, not scale);
  *   - orders/lineitem: key shift only; the synthesis mod-classes (%97,
  *     %101, ...) keep the same defect rates in every replica.
  * Replica 0 is byte-faithful to the source rows (identity perm, no flips).
  *
  * PLANTED NEAR-DUPS (the adversarial-realism mode, VERDICT r3 #6): the
  * synthetic corpus has no cosine/Jaccard gap, so the LSH paths measure
  * their worst case — every candidate is borderline. With plantPermille
  * > 0, a controlled fraction of documents/embeddings gains ONE planted
  * near-duplicate at a KNOWN similarity (word substitution every
  * [[PlantPeriod]] tokens → 3-gram Jaccard ≈ 0.88; sign-flipping 1/20 of
  * components → cosine ≈ 0.9), ids offset by [[PlantOffset]] so
  * (id, id + PlantOffset) enumerates the ground-truth planted pairs —
  * which is what lets tools.DupBench measure RECALL and candidate-prune
  * factors against brute force at a realistic dup rate.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> [replicas]
  * [plantPermille] [megaPermille]
  */
object ScaleUp {

  /** Key offset between replicas — far above any sf0.1 key. Even, so the
    * `pair = o_orderkey DIV 2` dup-pairing never spans replicas.
    */
  val Offset = 1000000000L

  /** Planted-twin id offset: half a replica stride, so planted ids stay
    * inside their replica's key space and `(id, id + PlantOffset)` is the
    * exact ground-truth pair list.
    */
  val PlantOffset: Long = Offset / 2

  /** Every PlantPeriod-th token of a planted doc twin is substituted: a
    * replaced word kills its 3 covering shingles, so the twin's 3-gram
    * Jaccard ≈ (1−3/48)/(1+3/48) ≈ 0.88 — above the 0.8 dedup threshold
    * with margin, the realistic "light edit" near-dup.
    */
  val PlantPeriod = 48

  /** Ten distinct vowel permutations; index 0 is the identity. */
  private val perms = Seq("aeiou", "eioua", "iouae", "ouaei", "uaeio",
    "eaoui", "ieuao", "oaeui", "uoiea", "euoia")

  /** The planted degenerate 8-gram (megaPermille mode): one fixed
    * boilerplate prefix shared VERBATIM by a controlled fraction of docs
    * across every replica — the "license header in 10% of the corpus"
    * worst case for exact-substring dedup, whose per-gram occupancy no
    * banding bounds. tools.SubstrBench measures that doc_dedup_substr's
    * aggregate+join formulation absorbs it without a single-task blowup.
    */
  val MegaGram = "standard boilerplate license header appears on every page verbatim"

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "target/sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    val plantPermille = if (args.length > 3) args(3).toInt else 0
    val megaPermille = if (args.length > 4) args(4).toInt else 0
    require(plantPermille >= 0 && plantPermille <= 1000)
    require(megaPermille >= 0 && megaPermille <= 1000)
    // beyond perms.length the vowel permutations would cycle and replica 10
    // would be an exact text copy of replica 0 (shifted ids) — reintroducing
    // the cross-replica near-dup blob this generator exists to avoid; fail
    // loudly rather than silently measure that pathology
    require(replicas <= perms.length,
      s"replicas=$replicas exceeds the ${perms.length} distinct text " +
        "permutations; add permutations before scaling further")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val out = (0 until replicas).map(i => f(base, i)).reduce(_.union(_))
      out.repartition(32).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name x$replicas -> $dst")
    }

    replicate("orders") { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * Offset))
    }
    replicate("lineitem") { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * Offset))
    }
    replicate("documents") { (df, i) =>
      val permuted = df.withColumn("doc_id", col("doc_id") + lit(i * Offset))
        .withColumn("text",
          translate(col("text"), "aeiouAEIOU", perms(i % perms.length) +
            perms(i % perms.length).toUpperCase))
      // mega-gram AFTER the vowel permutation: the literal prefix is
      // byte-identical in every replica, concentrating one gram key
      val rep = if (megaPermille == 0) permuted
        else permuted.withColumn("text",
          when(col("doc_id") % 1000 < megaPermille,
            concat(lit(MegaGram + " "), col("text")))
            .otherwise(col("text")))
      if (plantPermille == 0) rep
      else rep.unionByName(
        // planted twin: light token substitution at a known Jaccard
        rep.filter(col("doc_id") % 1000 < plantPermille)
          .withColumn("doc_id", col("doc_id") + lit(PlantOffset))
          .withColumn("toks", split(trim(col("text")), "\\s+"))
          .withColumn("text", array_join(
            transform(col("toks"), (t, j) =>
              when(pmod(col("doc_id") + j, lit(PlantPeriod)) === 0,
                concat(lit("nd"), pmod(col("doc_id"), lit(97)).cast("string")))
                .otherwise(t)), " "))
          .drop("toks"))
    }
    replicate("embeddings") { (df, i) =>
      // per-replica isometry = coordinate PERMUTATION ∘ sign flips, both
      // seeded by the replica index: within-replica cosines are exactly
      // preserved (isometries), and cross-replica correlation stays at
      // the corpus's background level even for vectors whose energy
      // concentrates in few components (this corpus: ~31% in the top 4 of
      // 64). Sign flips alone already measure clean here because spike
      // POSITIONS are per-vector; the permutation additionally guards the
      // shared-spike case (e.g. a corpus-wide bias direction), where
      // flips alone would leave a heavy-tailed signed overlap. Measured:
      // cross-replica pair density at cos ≥ 0.35 equals the corpus's own
      // 2.5σ background (~0.2% of pairs) — replication adds no structure.
      val rnd = new scala.util.Random(i)
      val dim = graft.operators.Similarity.Dim
      val perm = rnd.shuffle((0 until dim).toVector)
      val sign = Vector.fill(dim)(if (rnd.nextBoolean()) 1f else -1f)
      val rep = df.withColumn("vec_id", col("vec_id") + lit(i * Offset))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else array((0 until dim).map(j =>
            element_at(col("embedding"), perm(j) + 1) * lit(sign(j))): _*))
      if (plantPermille == 0) rep
      else rep.unionByName(
        // planted twin: 1/20 of components sign-flipped → cosine ≈ 0.9
        rep.filter(col("vec_id") % 1000 < plantPermille)
          .withColumn("vec_id", col("vec_id") + lit(PlantOffset))
          .withColumn("embedding", transform(col("embedding"),
            (x, j) => when(pmod(xxhash64(col("vec_id"), j), lit(20)) === 0, -x)
              .otherwise(x))))
    }

    // remaining tables: straight file copy (dims + events keep one copy;
    // nothing in the heavy set joins them at scale-dependent cardinality)
    val copied = Seq("region", "nation", "customer", "supplier", "part", "events")
    copied.foreach { name =>
      val from = new java.io.File(s"$src/$name.parquet")
      val to = new java.io.File(s"$dst/$name.parquet")
      if (from.isDirectory) {
        if (to.exists) graft.sources.ManifestTable.deleteRecursively(to)
        copyTree(from, to)
      } else {
        to.getParentFile.mkdirs()
        java.nio.file.Files.copy(from.toPath, to.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
      }
      println(s"[scaleup] $name copied")
    }
    spark.stop()
  }

  private def copyTree(from: java.io.File, to: java.io.File): Unit = {
    to.mkdirs()
    from.listFiles.foreach { f =>
      val t = new java.io.File(to, f.getName)
      if (f.isDirectory) copyTree(f, t)
      else java.nio.file.Files.copy(f.toPath, t.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }
  }
}
