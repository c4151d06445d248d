package graft.operators

import graft.{Q, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation (SURVEY §2.D): language ID,
  * quality scoring, token counting, winnowing fingerprints. All map-only
  * Column expressions over `documents` — embarrassingly parallel, no
  * shuffle except each query's final presentation sort.
  */
object TextAnalysis {

  /** Tiny per-language stopword sets for the n-gram/stopword heuristic.
    * (Real deployments swap in larger lexicons; the operator shape — token
    * overlap scoring against broadcastable lexicons — is what scales.)
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "los", "las", "y", "es", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "zh" -> Seq("de", "shi", "le", "bu", "zai"))

  private val langOrder = Seq("en", "de", "es", "fr", "zh")

  private def hits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isInCollection(stopwords(lang)))).cast("long")

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  val defs: Map[String, Q] = Map(
    // Stopword-overlap language ID with deterministic priority tiebreak.
    "doc_lang_id" -> Q(
      (s, d) => {
        val base = docs(s, d).select(col("doc_id"), col("lang").as("label_lang"),
          TextOps.tokens(col("text")).as("toks"))
        val scored = langOrder.foldLeft(base) { (df, l) =>
          df.withColumn(s"hits_$l", hits(col("toks"), l))
        }
        val best = langOrder.map(l => col(s"hits_$l"))
          .reduceLeft((a, b) => greatest(a, b))
        // built inside-out so earlier languages win ties (CASE order)
        val predOrdered = langOrder.reverse.foldLeft(lit("und")) { (acc, l) =>
          when(col(s"hits_$l") === best && best > 0, lit(l)).otherwise(acc)
        }
        scored.withColumn("pred_lang", predOrdered)
          .select(Seq(col("doc_id"), col("label_lang"), col("pred_lang")) ++
            langOrder.map(l => col(s"hits_$l")): _*)
          .orderBy("doc_id")
      }, {
        val hitSql = stopwords.map { case (l, ws) =>
          val set = ws.map(w => s"'$w'").mkString(", ")
          l -> s"len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t IN ($set)))"
        }
        val best = langOrder.map(l => s"hits_$l").mkString("greatest(", ", ", ")")
        val pred = langOrder.map(l =>
          s"WHEN hits_$l = $best AND $best > 0 THEN '$l'").mkString(" ")
        s"""WITH scored AS (
           |  SELECT doc_id, lang AS label_lang,
           |    ${langOrder.map(l => s"${hitSql(l)} AS hits_$l").mkString(",\n    ")}
           |  FROM documents)
           |SELECT doc_id, label_lang,
           |  CASE $pred ELSE 'und' END AS pred_lang,
           |  ${langOrder.map(l => s"hits_$l").mkString(", ")}
           |FROM scored ORDER BY doc_id""".stripMargin
      }),

    // Quality scoring: length/stopword/type-token/word-length signals with
    // a fixed linear score. Per-row double arithmetic in an identical
    // operation order both engines.
    "doc_quality_score" -> Q(
      (s, d) => {
        val allStops = stopwords.values.flatten.toSeq.distinct
        docs(s, d)
          .withColumn("toks", TextOps.tokens(col("text")))
          .withColumn("n_tokens", size(col("toks")).cast("long"))
          .withColumn("n_chars_m", length(col("text")))
          .withColumn("stop_ratio",
            size(filter(col("toks"), t => t.isInCollection(allStops)))
              .cast("double") / col("n_tokens"))
          .withColumn("distinct_ratio",
            size(array_distinct(col("toks"))).cast("double") / col("n_tokens"))
          .withColumn("mean_word_len",
            (col("n_chars_m") - col("n_tokens") + 1).cast("double") / col("n_tokens"))
          .withColumn("quality_score",
            least(col("n_tokens").cast("double") / 100, lit(1.0)) * 0.4 +
              col("stop_ratio") * 0.2 + col("distinct_ratio") * 0.4)
          .select("doc_id", "n_tokens", "stop_ratio", "distinct_ratio",
            "mean_word_len", "quality_score")
          .orderBy("doc_id")
      }, {
        val allStops = stopwords.values.flatten.toSeq.distinct
          .map(w => s"'$w'").mkString(", ")
        s"""WITH t AS (
           |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,
           |    length(text) AS nc
           |  FROM documents),
           |m AS (
           |  SELECT doc_id, len(toks) AS n_tokens,
           |    cast(len(list_filter(toks, x -> x IN ($allStops))) as double)
           |      / len(toks) AS stop_ratio,
           |    cast(len(list_distinct(toks)) as double) / len(toks) AS distinct_ratio,
           |    cast(nc - len(toks) + 1 as double) / len(toks) AS mean_word_len
           |  FROM t)
           |SELECT doc_id, n_tokens, stop_ratio, distinct_ratio, mean_word_len,
           |  least(cast(n_tokens as double) / 100, 1.0) * 0.4
           |    + stop_ratio * 0.2 + distinct_ratio * 0.4 AS quality_score
           |FROM m ORDER BY doc_id""".stripMargin
      }),

    // Token counting: whitespace tokens, a BPE-ish regex lexer count, and a
    // chars-per-token ratio (the usual tokens≈chars/4 sanity signal).
    "doc_token_count" -> Q(
      (s, d) => docs(s, d)
        .withColumn("ws_tokens", size(TextOps.tokens(col("text"))).cast("long"))
        .withColumn("re_tokens",
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .cast("long"))
        .withColumn("n_chars_seen", length(col("text")).cast("long"))
        .withColumn("chars_per_token",
          col("n_chars_seen").cast("double") / col("re_tokens"))
        .select("doc_id", "ws_tokens", "re_tokens", "n_chars_seen",
          "chars_per_token")
        .orderBy("doc_id"),
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens,
        |  cast(length(text) as bigint) AS n_chars_seen,
        |  cast(length(text) as double)
        |    / len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |    AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Corpus statistics: global top-k bigrams by document frequency —
    // explode is map-only; the count groupBy shuffles (ngram) keys and
    // the global top-k runs as TakeOrderedAndProject.
    "doc_topk_ngrams" -> Q(
      (s, d) => docs(s, d)
        // tokens bound as a column first: ngrams' lambdas reference the
        // token array, and an inlined split would re-run per element
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(TextOps.ngrams(col("toks"), 2)).as("bigram"))
        .groupBy("bigram")
        .agg(countDistinct(col("doc_id")).as("doc_freq"),
          count(lit(1)).as("total_freq"))
        .orderBy(col("doc_freq").desc, col("total_freq").desc, col("bigram"))
        .limit(50),
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
        |    for i in generate_series(1, len(w) - 1)]) AS bigram
        |  FROM toks)
        |SELECT bigram, count(DISTINCT doc_id) AS doc_freq,
        |  count(*) AS total_freq
        |FROM grams GROUP BY bigram
        |ORDER BY doc_freq DESC, total_freq DESC, bigram LIMIT 50""".stripMargin),

    // Composite curation pipeline: exact-dedup survivorship + quality gate
    // feeding per-source corpus statistics — the end-to-end shape of a
    // training-data filter stage (each stage is the operator defined above).
    "doc_curation" -> Q(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("norm_hash")
        Tables.documents(s, d).select("doc_id", "text", "source")
          .withColumn("toks", TextOps.tokens(col("text")))
          .withColumn("n_tokens", size(col("toks")).cast("long"))
          .withColumn("distinct_ratio",
            size(array_distinct(col("toks"))).cast("double") / col("n_tokens"))
          .withColumn("norm_hash", sha2(TextOps.normalized(col("text")), 256))
          .withColumn("keep",
            col("doc_id") === min("doc_id").over(w) && col("distinct_ratio") >= 0.3)
          .filter(col("keep"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            round(avg(col("distinct_ratio")), 6).as("avg_distinct_ratio"))
          .orderBy("source")
      },
      """WITH scored AS (
        |  SELECT doc_id, source,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |    cast(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) as double)
        |      / len(regexp_split_to_array(trim(text), '\s+')) AS distinct_ratio,
        |    sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_hash
        |  FROM documents),
        |kept AS (
        |  SELECT * FROM (
        |    SELECT *, min(doc_id) OVER (PARTITION BY norm_hash) AS canon
        |    FROM scored)
        |  WHERE doc_id = canon AND distinct_ratio >= 0.3)
        |SELECT source, count(*) AS n_docs,
        |  cast(sum(n_tokens) as bigint) AS total_tokens,
        |  round(avg(distinct_ratio), 6) AS avg_distinct_ratio
        |FROM kept GROUP BY source ORDER BY source""".stripMargin),

    // Winnowing fingerprints (k=8 char-grams, window 4), exploded to the
    // (doc, fingerprint) grain — the unit a cross-corpus plagiarism /
    // near-dup index is built on. Rows-only: DuckDB lacks xxhash64.
    "doc_fingerprint" -> Q(
      (s, d) => docs(s, d)
        // k-gram hashes bound as a column first — windowing over an inlined
        // hash expression would re-hash the text once per window (O(n²))
        .select(col("doc_id"), TextOps.kgramHashes(col("text"), k = 8).as("hs"))
        .select(col("doc_id"),
          explode(TextOps.winnowFromHashes(col("hs"), w = 4)).as("fingerprint"))
        .orderBy("doc_id", "fingerprint"),
      None)
  )
}
