package graft.streaming

import java.io.File

import graft.functions.TextOps
import graft.sources.ManifestTable
import graft.sources.ManifestTable.TableBatch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate detection against a STORED corpus index —
  * the continuous-ingest shape of MinHash-LSH dedup: when a new document
  * batch arrives, find its near-dups against everything already ingested
  * WITHOUT recomputing (or even rescanning) the existing corpus, then
  * fold the batch into the index so the next batch checks against it.
  * This is what a 100 TB training-data pipeline actually runs — the
  * one-shot corpus dedup (operators/Dedup) is its bootstrap, this is its
  * steady state.
  *
  * Storage is one [[ManifestTable]] root with four tables committed in a
  * single atomic swap per batch (a crash never leaves the index ahead of
  * the corpus or vice versa, and a replayed batch id is a no-op):
  *  - `docs`      (doc_id, text)           — the corpus record;
  *  - `shingles`  (doc_id, sh)             — hashed 3-gram shingle sets,
  *                                           the verify-stage operand;
  *  - `mh_bands`  (doc_id, band, band_hash) — the LSH posting list,
  *    APPEND-mode keyed on (band, band_hash) so rows ROUTE to buckets by
  *    band key: an incoming batch's probe opens only the index buckets
  *    its own band hashes cover ([[ManifestTable.readTableBuckets]]) —
  *    candidate lookup cost scales with the batch, not the corpus;
  *  - `near_dup_pairs` (doc_a, doc_b, jaccard) — the accumulated verdit.
  *
  * Per-batch dataflow (all candidate-bounded after the map-only prep):
  *  1. map-only: shingle → MinHash signature → band hashes for the batch;
  *  2. probe: batch bands ⋈ stored posting-list buckets → (old, new)
  *     candidates; batch bands self-join → within-batch candidates;
  *  3. verify: exact hashed-shingle Jaccard — new-side sets ride the
  *     batch, old-side sets load via the shingles table's doc-id buckets
  *     (only the buckets the candidates' old ids cover);
  *  4. commit batch docs + shingles + postings + verified pairs in ONE
  *     atomic swap.
  *
  * A pair is discovered exactly once — in the batch that ingests its
  * LATER document (the earlier one is in the index by then); pairs are
  * canonicalized (doc_a < doc_b). Band math matches operators/Dedup: 32
  * hashes × 8 bands of 4 rows → candidate probability ≈ 0.99 at the 0.8
  * verify threshold, ~0 at the cross-doc baseline.
  */
object IncrementalDedup {

  val DocsTable = "docs"
  val ShinglesTable = "shingles"
  val IndexTable = "mh_bands"
  val PairsTable = "near_dup_pairs"
  val QueryId = "dedup"

  val K = 32
  val Bands = 8
  val JaccardThreshold = 0.8
  val DocBuckets = 8
  val IndexBuckets = 16

  /** The accumulated near-dup pairs over everything ingested so far. */
  def pairs(spark: SparkSession, root: String): DataFrame =
    ManifestTable.readTable(spark, root, table = PairsTable)

  /** The ingested corpus. */
  def corpus(spark: SparkSession, root: String): DataFrame =
    ManifestTable.readTable(spark, root, table = DocsTable)

  /** Ingest one batch of (doc_id, text): returns the batch's verified
    * near-dup pairs (against the stored corpus AND within the batch) and
    * commits docs + index + pairs atomically. Replayed (QueryId, batchId)
    * pairs recompute the same result and commit nothing. The returned
    * frame is persisted (its lineage reads pre-commit index state);
    * unpersist it when done.
    */
  def ingest(spark: SparkSession, root: File, batchId: Long,
      docBatch: DataFrame): DataFrame = {
    val batch = docBatch.select("doc_id", "text").persist()
    val pinned = scala.collection.mutable.ListBuffer[DataFrame](batch)
    try {
      val sh = batch.select(col("doc_id"),
        TextOps.shingles(TextOps.tokens(col("text"))).as("shings"))
      val hashed = sh.select(col("doc_id"),
        array_distinct(transform(col("shings"), x => xxhash64(x))).as("sh"))
        .persist()
      pinned += hashed
      val banded = sh
        .select(col("doc_id"),
          TextOps.minhashSignature(col("shings"), K).as("sig"))
        .select(col("doc_id"),
          explode(TextOps.bandHashes(col("sig"), K, Bands)).as("b"))
        .select(col("doc_id"), col("b.band").as("band"),
          col("b.band_hash").as("band_hash"))
        .persist()
      pinned += banded

      // ---- probe the stored posting list: bucket-pruned by band key ----
      val idxBucket =
        pmod(xxhash64(col("band"), col("band_hash")), lit(IndexBuckets))
      val probeBuckets = banded.select(idxBucket.as("__b")).distinct()
        .collect().map(_.getLong(0)).toSet
      val oldCands = ManifestTable
        .readTableBuckets(spark, root.toString, probeBuckets, IndexTable)
        .map { idx =>
          banded.join(
            idx.select(col("doc_id").as("old_id"), col("band"),
              col("band_hash")),
            Seq("band", "band_hash"))
            // a replayed batch probes an index already holding its own
            // rows: self-matches are not pairs
            .filter(col("old_id") =!= col("doc_id"))
            .select(least(col("old_id"), col("doc_id")).as("doc_a"),
              greatest(col("old_id"), col("doc_id")).as("doc_b"))
            .distinct()
        }
      // ---- within-batch candidates ----
      val newCands = banded
        .join(banded.select(col("doc_id").as("doc_id_b"), col("band"),
          col("band_hash")), Seq("band", "band_hash"))
        .filter(col("doc_id") < col("doc_id_b"))
        .select(col("doc_id").as("doc_a"), col("doc_id_b").as("doc_b"))
        .distinct()
      val cands =
        oldCands.fold(newCands)(_.unionByName(newCands).distinct()).persist()
      pinned += cands

      // ---- verify: exact hashed-shingle Jaccard ----
      // new-side sets come from the batch; old-side sets load via the
      // shingles table restricted to the buckets the candidate old ids
      // cover (ids in the batch resolve batch-side first)
      val newSh = hashed.select(col("doc_id"), col("sh"))
      val oldIds = cands.select(col("doc_a").as("doc_id"))
        .unionByName(cands.select(col("doc_b").as("doc_id")))
        .distinct()
        .join(newSh.select("doc_id"), Seq("doc_id"), "left_anti")
      val docBucket = pmod(xxhash64(col("doc_id")), lit(DocBuckets))
      val oldBuckets = oldIds.select(docBucket.as("__b")).distinct()
        .collect().map(_.getLong(0)).toSet
      val oldSh =
        if (oldBuckets.isEmpty) newSh.limit(0)
        else ManifestTable
          .readTableBuckets(spark, root.toString, oldBuckets, ShinglesTable)
          .map(_.join(oldIds, Seq("doc_id"), "left_semi")
            .select(col("doc_id"), col("sh")))
          .getOrElse(newSh.limit(0))
      val allSh = newSh.unionByName(oldSh)
      val verified = cands
        .join(allSh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
          "doc_a")
        .join(allSh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
          "doc_b")
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))))
        .filter(col("jaccard") >= JaccardThreshold)
        .select("doc_a", "doc_b", "jaccard")
        .persist()

      // ---- one atomic swap: corpus + verify operand + postings + pairs
      ManifestTable.mergeBatch(root, QueryId, batchId, Seq(
        TableBatch(DocsTable, batch, Seq("doc_id"), DocBuckets,
          append = true),
        TableBatch(ShinglesTable, hashed, Seq("doc_id"), DocBuckets,
          append = true),
        TableBatch(IndexTable, banded, Seq("band", "band_hash"),
          IndexBuckets, append = true),
        TableBatch(PairsTable, verified, Seq("doc_a", "doc_b"), 4,
          append = true)))
      // force before unpersist: the caller gets a materialized result
      verified.count()
      verified
    } finally { pinned.foreach(_.unpersist()); () }
  }
}
