package graft.operators

import graft.{Q, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  private def embs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), col("label"),
        VectorOps.norm(col("embedding")).as("nrm"))

  /** Deterministic query subset: every 100th vector. */
  private def queries(s: SparkSession, d: String): DataFrame =
    embs(s, d).filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))

  /** Deterministic IVF centroids: every 50th vector (a k-means fit would
    * slot in here; centroid choice is orthogonal to the probe plumbing).
    */
  private def centroids(s: SparkSession, d: String): DataFrame =
    embs(s, d).filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))

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
        val a = embs(s, d).select(col("vec_id").as("vec_id_a"),
          col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
        val b = embs(s, d).select(col("vec_id").as("vec_id_b"),
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

    // Brute-force cosine top-k per query: broadcast the (small) query set
    // against the full corpus — one scan, per-group heap via window+filter.
    "emb_ann_topk" -> Q(
      (s, d) => topkAgainst(embs(s, d), queries(s, d), TopK)
        .orderBy("q_id", "rank"),
      None),

    // L2 normalization — the standard pre-step before cosine/ANN indexing.
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
        val e = embs(s, d)
        val c = centroids(s, d)
        // nearest-centroid assignment: broadcast cross + max_by aggregation —
        // the n×C expansion collapses map-side (partial agg), so the shuffle
        // carries n rows, not n×C
        val assigned = e.join(broadcast(c), lit(true))
          .withColumn("ccos", VectorOps.cosinePre(
            col("embedding"), col("nrm"), col("c_emb"), col("c_nrm")))
          .groupBy("vec_id")
          .agg(max_by(col("c_id"), col("ccos")).as("c_id"),
            first(col("embedding")).as("embedding"), first(col("nrm")).as("nrm"))
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
      None)
  )
}
