package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the similarity stack against a PLANTED near-dup corpus
  * (ScaleUp's plantPermille mode): ground truth is the (id, id +
  * PlantOffset) twin list, so recall is exact — and the candidate-pair
  * counts quantify how far below n² the LSH blocking stays at a realistic
  * dup rate (the number SURVEY §5's adversarial-corpus table records).
  *
  * Prints one JSON line:
  *   docs: corpus size, brute-force pair count, MinHash-LSH candidate
  *     pairs (doc_minhash_lsh), verified near-dup pairs ≥ the Jaccard
  *     threshold (doc_ngram_jaccard), planted-twin recall through the
  *     full candidate→verify pipeline, and the prune factor.
  *   emb: same for the embedding path (emb_cosine_lsh verified pairs vs
  *     brute force; planted twins sit at cosine ≈ 0.9, far above the
  *     0.35 threshold).
  *
  * Usage: runMain graft.tools.DupBench <plantedSfDir>
  */
object DupBench {

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "target/sf0.1p"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q(name: String) = SparkEntry.queries(name)(spark, dir)

    // ---- documents: MinHash-LSH candidates → exact-Jaccard verify ----
    val docs = graft.Tables.documents(spark, dir)
    val nDocs = docs.count()
    val plantedDocs = docs
      .filter(col("doc_id") >= ScaleUp.PlantOffset &&
        (col("doc_id") % ScaleUp.Offset) >= ScaleUp.PlantOffset)
      .select((col("doc_id") - ScaleUp.PlantOffset).as("doc_a"),
        col("doc_id").as("doc_b"))
    val nPlantedDocs = plantedDocs.count()
    val docCand = q("doc_minhash_lsh").select("doc_a", "doc_b")
    val nDocCand = docCand.count()
    val verified = q("doc_ngram_jaccard").select("doc_a", "doc_b")
    val nVerified = verified.count()
    val docFound = plantedDocs.join(verified, Seq("doc_a", "doc_b"),
      "left_semi").count()
    // recall denominator = planted twins whose TRUE shingle Jaccard meets
    // the threshold: short docs lose a large shingle fraction to one
    // substituted word and are correctly not near-dups at 0.8
    import graft.functions.TextOps
    val sh = docs.select(col("doc_id"),
      TextOps.shingles(TextOps.tokens(col("text"))).as("sh"))
    val docQual = plantedDocs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .filter(size(col("sh_a")) > 0 && size(col("sh_b")) > 0)
      .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))) >=
        graft.operators.Dedup.JaccardThreshold)
      .count()

    // ---- embeddings: SRP-LSH bucketed pairs vs brute force ----
    val emb = graft.Tables.embeddings(spark, dir)
    val nEmb = emb.count()
    val plantedEmb = emb
      .filter(col("vec_id") >= ScaleUp.PlantOffset &&
        (col("vec_id") % ScaleUp.Offset) >= ScaleUp.PlantOffset)
      .select((col("vec_id") - ScaleUp.PlantOffset).as("vec_id_a"),
        col("vec_id").as("vec_id_b"))
    val nPlantedEmb = plantedEmb.count()
    // candidate volume of the SRP blocking itself (pre-verify)
    import graft.functions.HashExprs
    import graft.operators.Similarity
    def srpCandidates(bits: Int, bands: Int): Long = {
      val keyed = emb.select(col("vec_id"), explode(HashExprs.srpBands(
        col("embedding"), Similarity.Dim, bits, bands)).as("bk"))
      keyed
        .join(keyed.select(col("vec_id").as("vec_id_b"), col("bk")), Seq("bk"))
        .filter(col("vec_id") < col("vec_id_b"))
        .select("vec_id", "vec_id_b").distinct().count()
    }
    // the 0.35-threshold enumeration config (emb_cosine_lsh)
    val nEmbCand = srpCandidates(Similarity.SrpBits, Similarity.SrpBands)
    val embPairs = q("emb_cosine_lsh").select("vec_id_a", "vec_id_b")
    val nEmbPairs = embPairs.count()
    val embFound = plantedEmb.join(embPairs, Seq("vec_id_a", "vec_id_b"),
      "left_semi").count()
    // the high-threshold near-dup config (Similarity.nearDupPairs) — the
    // operating point a semantic-dedup pipeline actually runs
    val ndCand = srpCandidates(Similarity.NearDupBits, Similarity.NearDupBands)
    val ndPairs = Similarity.nearDupPairs(emb.select("vec_id", "embedding"))
      .select("vec_id_a", "vec_id_b")
    val nNdPairs = ndPairs.count()
    val ndFound = plantedEmb.join(ndPairs, Seq("vec_id_a", "vec_id_b"),
      "left_semi").count()
    // recall denominator = planted twins that actually sit at/above the
    // threshold (the flip-energy fraction varies per vector, so a minority
    // of twins land below 0.85 and are correctly not near-dups)
    import graft.functions.VectorOps
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      VectorOps.norm(col("embedding")).as("nrm"))
    val ndQual = plantedEmb
      .join(withNorm.select(col("vec_id").as("vec_id_a"),
        col("embedding").as("emb_a"), col("nrm").as("nrm_a")), "vec_id_a")
      .join(withNorm.select(col("vec_id").as("vec_id_b"),
        col("embedding").as("emb_b"), col("nrm").as("nrm_b")), "vec_id_b")
      .filter(VectorOps.cosinePre(col("emb_a"), col("nrm_a"),
        col("emb_b"), col("nrm_b")) >= Similarity.NearDupThreshold)
      .count()

    def brute(n: Long): Long = n * (n - 1) / 2
    def ratio(a: Long, b: Long): Double =
      if (b == 0) 0.0 else a.toDouble / b

    val json =
      s"""{"dir":"$dir",""" +
      s""""docs":{"n":$nDocs,"brute_pairs":${brute(nDocs)},""" +
      s""""lsh_candidates":$nDocCand,"verified_pairs":$nVerified,""" +
      s""""planted":$nPlantedDocs,"planted_qualifying":$docQual,""" +
      s""""planted_found":$docFound,""" +
      s""""recall_at_threshold":${ratio(docFound, docQual)},""" +
      s""""prune_x":${ratio(brute(nDocs), nDocCand)}},""" +
      s""""emb":{"n":$nEmb,"brute_pairs":${brute(nEmb)},""" +
      s""""lsh_candidates":$nEmbCand,"verified_pairs":$nEmbPairs,""" +
      s""""planted":$nPlantedEmb,"planted_found":$embFound,""" +
      s""""recall":${ratio(embFound, nPlantedEmb)},""" +
      s""""prune_x":${ratio(brute(nEmb), nEmbCand)}},""" +
      s""""emb_neardup":{"threshold":${Similarity.NearDupThreshold},""" +
      s""""lsh_candidates":$ndCand,"verified_pairs":$nNdPairs,""" +
      s""""planted":$nPlantedEmb,"planted_qualifying":$ndQual,""" +
      s""""planted_found":$ndFound,""" +
      s""""recall_at_threshold":${ratio(ndFound, ndQual)},""" +
      s""""prune_x":${ratio(brute(nEmb), ndCand)}}}"""
    println(json)
    spark.stop()
  }
}
