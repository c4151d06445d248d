package graft

import graft.functions.{Bpe, TextOps}
import org.apache.spark.sql.functions._

/** Faithful BPE tokenization (VERDICT r3 #8): the codegen'd expression must
  * implement classic greedy lowest-rank-first BPE exactly — checked against
  * hand-derived fixtures AND an independently-written recursive reference
  * implementation over real corpus text. (The DuckDB gate additionally
  * hash-matches the full token stream via the sequential-replace oracle —
  * doc_bpe_tokens / doc_chunk_pack / doc_shard_manifest.)
  */
class BpeSpec extends SparkSpec {

  private def encode(texts: Seq[String]): Seq[Seq[String]] = {
    import spark.implicits._
    val df = texts.toDF("text")
      .select(TextOps.bpeTokens(col("text")).as("toks"))
    df.collect().map(_.getSeq[String](0).toSeq).toSeq
  }

  /** Independent reference: recursive merge-all + minBy over rule ranks —
    * deliberately a different shape than BpeRuntime's imperative loop.
    */
  private def refEncode(text: String): Seq[String] = {
    def mergeAll(syms: List[String], x: String, y: String): List[String] =
      syms match {
        case a :: b :: rest if a == x && b == y => (x + y) :: mergeAll(rest, x, y)
        case a :: rest => a :: mergeAll(rest, x, y)
        case Nil => Nil
      }
    def word(w: String): List[String] = {
      var syms = w.toList.map(_.toString)
      var done = false
      while (!done && syms.length > 1) {
        val pairs = syms.zip(syms.tail)
        val present = Bpe.Merges.zipWithIndex
          .filter { case ((x, y), _) => pairs.contains((x, y)) }
        if (present.isEmpty) done = true
        else {
          val ((x, y), _) = present.minBy(_._2)
          syms = mergeAll(syms, x, y)
        }
      }
      syms
    }
    text.trim.split("\\s+").toSeq.filter(_.nonEmpty).flatMap(word)
  }

  test("hand-derived fixture words encode exactly") {
    // "the": t,h → th (r0); th,e → the (r1)
    // "and": a,n → an (r3); an,d → and (r4)
    // "2000": (0,0) r25 beats (2,0) r27 → 2,00,0 (left-to-right, no overlap)
    // "city": (i,t) r22 → c,it,y; (it,y) r23 → c,ity
    // "edited": (e,d) r21 both → ed,i,t,ed; (i,t) → ed,it,ed
    val got = encode(Seq("the", "and", "2000", "city", "edited", "a", ""))
    assert(got == Seq(
      Seq("the"), Seq("and"), Seq("2", "00", "0"), Seq("c", "ity"),
      Seq("ed", "it", "ed"), Seq("a"), Seq.empty))
  }

  test("multi-word text concatenates per-word encodings in order") {
    val got = encode(Seq("  the   city\tand\n2000  "))
    assert(got == Seq(Seq("the", "c", "ity", "and", "2", "00", "0")))
  }

  test("expression matches the independent reference implementation on corpus text") {
    val texts = Tables.documents(spark, sf).select("text")
      .limit(100).collect().map(_.getString(0)).toSeq
    assert(texts.nonEmpty)
    val got = encode(texts)
    texts.zip(got).foreach { case (t, g) =>
      assert(g == refEncode(t), s"divergence on text: ${t.take(80)}")
    }
    // the merges actually fire on real text (subword count < char count)
    assert(got.map(_.length).sum < texts.map(_.length).sum)
  }

  test("chunk packing over BPE tokens conserves per-document totals") {
    val chunks = SparkEntry.queries("doc_chunk_pack")(spark, sf)
      .groupBy("doc_id")
      .agg(sum(col("chunk_tokens")).as("total"),
        max(col("chunk_tokens")).as("biggest"),
        count(lit(1)).as("n_chunks"))
    val toks = SparkEntry.queries("doc_bpe_tokens")(spark, sf)
      .select(col("doc_id"), col("n_bpe_tokens"))
    val joined = chunks.join(toks, "doc_id")
    assert(joined.filter(col("total") =!= col("n_bpe_tokens")).count() == 0)
    assert(joined.filter(col("biggest") > operators.Curation.ChunkTokens)
      .count() == 0)
    // every chunk except a document's last is exactly full
    val full = SparkEntry.queries("doc_chunk_pack")(spark, sf)
      .withColumn("last_chunk", col("chunk_id") ===
        max(col("chunk_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .filter(!col("last_chunk") &&
        col("chunk_tokens") =!= operators.Curation.ChunkTokens)
    assert(full.count() == 0)
  }
}
