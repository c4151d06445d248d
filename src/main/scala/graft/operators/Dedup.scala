package graft.operators

import graft.{Q, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication operators (SURVEY §2.D): exact hash dedup plus
  * the three standard near-dup families (MinHash+LSH, SimHash, shingle
  * Jaccard).
  *
  * Scale notes (100 TB):
  *   - Exact dedup: one hash-shuffle on sha2(normalized_text) — a window
  *     min per hash group, never a full-row dropDuplicates.
  *   - MinHash/SimHash signatures are map-only; candidate generation joins
  *     on band/chunk buckets, so the shuffle is keyed on bucket ids and the
  *     pair work scales with bucket occupancy, not O(n²). SimHash chunking
  *     is an exact blocking for hamming ≤ 3 (pigeonhole over 4×16 bits).
  *   - Signatures ride through the bucket join (≲300 B/row) instead of
  *     re-joining the corpus twice to score candidates.
  */
object Dedup {

  // fanOut: the heavy per-row map work (tokenize/shingle/hash chains)
  // must not serialize on a one-row-group input scan — see Tables.fanOut
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.fanOut(Tables.documents(s, d).select("doc_id", "text"))

  private val K = 32       // minhash signature length
  // 8 bands × 4 rows: candidate probability 1-(1-j⁴)⁸ ≈ 0.99 at j=0.8
  // (the verify threshold) and ~0 at the 3-gram cross-doc baseline j≈0
  private val Bands = 8
  val JaccardThreshold = 0.8
  val ContainmentThreshold = 0.8
  val MaxFpDf = 20      // stop-fingerprint document-frequency cutoff
  val MinSharedFp = 5   // shared fingerprints to call a candidate pair

  /** Per-doc 3-gram shingle sets. Tokens bind as their own column first —
    * the ngram lambda would otherwise re-tokenize per element (O(n²)).
    */
  private def shingleSets(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextOps.shingles(col("toks")).as("sh"))

  /** Per-doc MinHash signatures (map-only). */
  private def sigs(s: SparkSession, d: String): DataFrame =
    shingleSets(s, d)
      .select(col("doc_id"), TextOps.minhashSignature(col("sh"), K).as("sig"))

  /** Candidate pairs from LSH buckets with signature-estimated Jaccard.
    * The band self-join carries doc ids ONLY (the heavy signature arrays
    * would multiply the shuffle payload by the collision count); signatures
    * re-join onto the deduped pairs afterwards — a per-doc-keyed join that
    * AQE broadcasts when the sig table is small.
    */
  private val candCache = graft.Caches.dfCache()

  /** Hashed shingle sets (64-bit per shingle), materialized per
    * (session, dir): the verify-stage operators join this table on BOTH
    * pair sides, and without the persist each side would re-run the
    * tokenize→3-gram→hash chain — the dominant per-doc cost — twice per
    * query. Forced by `buildCandidates` so Bench charges it to the
    * candidate-index build, not a hidden first iteration.
    */
  private val shCache = graft.Caches.dfCache()

  // lazily persisted: buildCandidates (or the first consuming query)
  // forces the single materializing scan
  private[graft] def hashedShingles(s: SparkSession, d: String): DataFrame =
    shCache.getOrElseUpdate(s, d)(graft.Caches.pinLayout(
      shingleSets(s, d)
        .select(col("doc_id"),
          array_distinct(transform(col("sh"), x => xxhash64(x))).as("sh")),
      partKeys = Seq(col("doc_id")), order = Seq(col("doc_id"))))

  private[graft] def lshCandidates(s: SparkSession, d: String): DataFrame =
    candCache.getOrElseUpdate(s, d)(graft.Caches.pinLayout(
      lshCandidatesUncached(s, d),
      partKeys = Seq(col("doc_a")),
      order = Seq(col("doc_a"), col("doc_b"))))

  private def lshCandidatesUncached(s: SparkSession, d: String): DataFrame = {
    val sg = sigs(s, d)
    val banded = sg
      .select(col("doc_id"), explode(TextOps.bandHashes(col("sig"), K, Bands)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.band_hash").as("band_hash"))
    val pairs = banded
      .join(banded.select(col("doc_id").as("doc_id_b"), col("band"), col("band_hash")),
        Seq("band", "band_hash"))
      .filter(col("doc_id") < col("doc_id_b"))
      .groupBy(col("doc_id").as("doc_a"), col("doc_id_b").as("doc_b"))
      .agg(count(lit(1)).as("n_bands_matched"))
    pairs
      .join(sg.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sg.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => (x === y).cast("int")), lit(0), (acc, v) => acc + v)
          .cast("double") / K)
      .drop("sig_a", "sig_b")
  }

  /** Exact-dup groups over the normalized-text sha2 — the stored index
    * behind doc_dedup_exact, the containment candidates' exact-pair
    * supplement, and the near-dup edge set: all three previously re-ran
    * the normalize→sha2→window pass per execution.
    */
  private val exactCache = graft.Caches.dfCache()

  private[graft] def exactDedup(s: SparkSession, d: String): DataFrame =
    exactCache.getOrElseUpdate(s, d) {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("norm_hash")
      graft.Caches.pinLayout(
        docs(s, d)
          .withColumn("norm_hash", sha2(TextOps.normalized(col("text")), 256))
          .withColumn("canonical_doc_id", min("doc_id").over(w))
          .withColumn("group_size", count(lit(1)).over(w))
          .select(col("doc_id"), col("norm_hash"), col("canonical_doc_id"),
            col("group_size"),
            (col("doc_id") =!= col("canonical_doc_id")).as("is_dup")),
        partKeys = Seq(col("doc_id")), order = Seq(col("doc_id")))
    }

  /** Force the one-time LSH candidate + hashed-shingle + exact-group
    * materializations (Bench line item).
    */
  def buildCandidates(s: SparkSession, d: String): Long = {
    // the minhash-band candidates are independent of the shingle/exact/
    // containment chain — overlap their MATERIALIZATION from a second
    // driver thread (guide §2.6). Plan CREATION stays serial on this
    // thread: expression-id and lambda-variable ordinals are allocated
    // session-globally at creation, and racing them would make the
    // cached plans (and the bench fingerprint ledger) timing-dependent.
    val lshDf = lshCandidates(s, d)
    val hsDf = hashedShingles(s, d)
    val exDf = exactDedup(s, d)
    val contDf = containmentCandidatesCached(s, d)
    var lsh = 0L
    val t = new Thread(() => { lsh = lshDf.count() })
    t.start()
    val rest = hsDf.count() + exDf.count() + contDf.count()
    t.join()
    lsh + rest
  }

  /** Rare winnowing fingerprints per doc — the (fp, doc_id) index behind
    * doc_fingerprint_pairs. Materialized per session like the LSH
    * candidates: the pair query self-joins this table, and without the
    * persist BOTH join sides would recompute the char-gram hash + winnow
    * subtree (the dominant cost).
    */
  private val fpCache = graft.Caches.dfCache()

  /** FULL winnowing fingerprint index — every (doc_id, fp) pair, before
    * the df-prune. Materialized once per (session, dir): the char-gram
    * hash + winnow chain is the dominant per-doc map cost, and it was
    * previously re-run by doc_fingerprint on every execution AND by the
    * rare-index build — one stored index now feeds both (the same
    * stored-table pattern as the LSH candidates; guide §1.2, do the
    * expensive pass once).
    */
  private val fpAllCache = graft.Caches.dfCache()

  private[operators] def allFingerprints(s: SparkSession, d: String): DataFrame =
    fpAllCache.getOrElseUpdate(s, d) {
      graft.Caches.pinLayout(
        docs(s, d)
          .select(col("doc_id"), TextOps.kgramHashes(col("text"), k = 8).as("hs"))
          .select(col("doc_id"),
            explode(TextOps.winnowFromHashes(col("hs"), w = 4)).as("fp")),
        partKeys = Seq(col("fp")), order = Seq(col("fp"), col("doc_id")))
    }

  private def rareFingerprints(s: SparkSession, d: String): DataFrame =
    fpCache.getOrElseUpdate(s, d) {
      // df-filter as a window count over the cached full index: the pin
      // already hash-partitioned it by fp, so the window adds no exchange
      // (winnowFromHashes already array_distincts per doc, so the (doc,
      // fp) pairs are unique — no global distinct needed)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
      val idx = allFingerprints(s, d)
        .withColumn("df", count(lit(1)).over(w))
        .filter(col("df") <= MaxFpDf)
        .drop("df")
      graft.Caches.pinLayout(idx, partKeys = Seq(col("fp")),
        order = Seq(col("fp"), col("doc_id")))
    }

  /** Force the one-time fingerprint-index builds (Bench line item). */
  def buildFingerprints(s: SparkSession, d: String): Long =
    allFingerprints(s, d).count() + rareFingerprints(s, d).count()

  /** Deterministic containment candidates: pairs sharing ≥ 2 rare shingles
    * (df ≤ MaxFpDf) from the inverted index, UNIONed with each exact-dup
    * group's (canonical, member) pairs. No hashing randomness is involved,
    * so the blocking is exactly re-derivable by the SQL oracle — the
    * property that lets both containment operators hash-match DuckDB.
    *
    * Why the union: the df-prune is what bounds bucket occupancy at scale,
    * but it also means a document duplicated MORE than MaxFpDf times has
    * no rare shingles at all — its dup pairs would silently vanish from
    * the candidate set, precisely the high-volume boilerplate case a
    * containment dedup exists to catch. The exact-dup supplement restores
    * those pairs at linear cost (one pair per group member, via the
    * group's min-id canonical — never the quadratic all-pairs).
    */
  /** Materialized per (session, dir) like the LSH candidates: the two
    * containment queries both start from this exact frame, and each
    * execution previously re-ran the df-window + self-join + exact-dup
    * chain — the dominant cost of both. Forced by `buildCandidates` so
    * the bench charges it to the candidate-index build line item.
    */
  private val contCache = graft.Caches.dfCache()

  private[graft] def containmentCandidatesCached(s: SparkSession, d: String): DataFrame =
    contCache.getOrElseUpdate(s, d)(graft.Caches.pinLayout(
      containmentCandidates(s, d),
      partKeys = Seq(col("doc_a")), order = Seq(col("doc_a"), col("doc_b"))))

  private def containmentCandidates(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val rare = hashedShingles(s, d)
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .withColumn("df", count(lit(1)).over(w))
      .filter(col("df") <= MaxFpDf)
      .select("doc_id", "g")
    val shingled = rare
      .join(rare.select(col("doc_id").as("doc_id_b"), col("g")), Seq("g"))
      .filter(col("doc_id") < col("doc_id_b"))
      .groupBy(col("doc_id").as("doc_a"), col("doc_id_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
      .select("doc_a", "doc_b")
    val exact = exactDedup(s, d)
      .filter(col("is_dup"))
      .select(col("canonical_doc_id").as("doc_a"), col("doc_id").as("doc_b"))
    shingled.union(exact).distinct()
  }

  /** DuckDB CTEs `t`, `s`: per-doc distinct word-3-gram shingle sets in
    * STRING form — set cardinalities (and so Jaccard/containment) match the
    * engine's xxhash64-hashed sets exactly unless a 64-bit hash collides
    * (absent at oracle scale; a collision would surface as a hash mismatch).
    * Mirrors TextOps.tokens/shingles: whitespace split, 3-gram, distinct.
    */
  private[operators] val shingleCtes: String =
    """t AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(toks) - 2, 0)),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM t)""".stripMargin

  /** DuckDB CTEs `ex`→`cand`: the rare-shingle blocking of
    * [[containmentCandidates]] re-derived over the string shingle sets.
    */
  private[operators] val containmentCandCtes: String =
    s"""ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
       |dfq AS (SELECT doc_id, g, count(*) OVER (PARTITION BY g) AS df FROM ex),
       |rare AS (SELECT doc_id, g FROM dfq WHERE df <= $MaxFpDf),
       |xg AS (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY
       |    sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS canon
       |  FROM documents),
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 2
       |  UNION
       |  SELECT canon AS doc_a, doc_id AS doc_b FROM xg WHERE doc_id > canon)""".stripMargin

  val defs: Map[String, Q] = Map(
    // Exact dedup on the normalized-text sha2: group id = hash, canonical
    // survivor = min doc_id per group.
    "doc_dedup_exact" -> Q(
      (s, d) => exactDedup(s, d).orderBy("doc_id"),
      """SELECT doc_id,
        |  sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS norm_hash,
        |  min(doc_id) OVER w AS canonical_doc_id,
        |  count(*) OVER w AS group_size,
        |  doc_id <> min(doc_id) OVER w AS is_dup
        |FROM documents
        |WINDOW w AS (PARTITION BY sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))))
        |ORDER BY doc_id""".stripMargin),

    // MinHash + LSH candidate pairs (signature agreement as Jaccard
    // estimate). Rows-only: DuckDB lacks xxhash64; DedupSpec checks the
    // estimates against exact Jaccard.
    "doc_minhash_lsh" -> Q(
      (s, d) => lshCandidates(s, d)
        .select("doc_a", "doc_b", "n_bands_matched", "est_jaccard")
        .orderBy("doc_a", "doc_b"),
      None),

    // SimHash near-dup pairs at hamming <= 3 via exact 16-bit-chunk blocking.
    "doc_simhash" -> Q(
      (s, d) => {
        val sh = docs(s, d)
          .withColumn("simhash", TextOps.simhash64(TextOps.tokens(col("text"))))
        val chunked = sh.select(col("doc_id"), col("simhash"),
          explode(TextOps.simhashChunks(col("simhash"))).as("c"))
          .select(col("doc_id"), col("simhash"),
            col("c.chunk_idx").as("chunk_idx"), col("c.chunk").as("chunk"))
        val r = chunked.select(col("doc_id").as("doc_id_b"),
          col("simhash").as("simhash_b"), col("chunk_idx"), col("chunk"))
        chunked.join(r, Seq("chunk_idx", "chunk"))
          .filter(col("doc_id") < col("doc_id_b"))
          .withColumn("hamming", TextOps.hamming(col("simhash"), col("simhash_b")))
          .filter(col("hamming") <= 3)
          .groupBy(col("doc_id").as("doc_a"), col("doc_id_b").as("doc_b"))
          .agg(first("hamming").as("hamming"))
          .orderBy("doc_a", "doc_b")
      },
      None),

    // Fingerprint-overlap candidate pairs: the fourth near-dup modality
    // (char-level winnowing, catches word-reordering edits MinHash word
    // shingles miss). Stop-fingerprints (document frequency > MaxFpDf) are
    // dropped BEFORE pairing — a fingerprint shared by thousands of docs
    // carries no near-dup signal but would blow the bucket join up
    // quadratically; this prune is what keeps the operator 100 TB-safe.
    "doc_fingerprint_pairs" -> Q(
      (s, d) => {
        val keyed = rareFingerprints(s, d)
        keyed
          .join(keyed.select(col("doc_id").as("doc_id_b"), col("fp")), Seq("fp"))
          .filter(col("doc_id") < col("doc_id_b"))
          .groupBy(col("doc_id").as("doc_a"), col("doc_id_b").as("doc_b"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= MinSharedFp)
          .orderBy("doc_a", "doc_b")
      },
      None),

    // Exact shingle-Jaccard verification of the LSH candidates — the
    // verify stage of the dedup pipeline; only candidate pairs pay the
    // set-intersection cost.
    "doc_ngram_jaccard" -> Q(
      (s, d) => {
        // intersect 64-bit shingle hashes, not strings: same Jaccard up to
        // a ~2^-58 collision chance, at a fraction of the comparison cost
        val sets = hashedShingles(s, d)
        // verify-stage pruning: only candidates whose MinHash estimate is
        // within slack of the threshold pay the exact set-intersection cost
        val cand = lshCandidates(s, d)
          .filter(col("est_jaccard") >= JaccardThreshold - 0.1)
          .select("doc_a", "doc_b")
        cand
          .join(sets.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("sh", "sh_a"), "doc_a")
          .join(sets.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("sh", "sh_b"), "doc_b")
          // sub-3-token docs have empty shingle sets whose sentinel MinHash
          // signatures collide in every band; without this guard the
          // division yields 0.0/0 = NaN, and Spark sorts NaN ABOVE all
          // numbers so NaN >= threshold passes — spuriously merging
          // unrelated tiny docs downstream in the cluster queries
          .filter(size(col("sh_a")) > 0 && size(col("sh_b")) > 0)
          .withColumn("jaccard",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
              size(array_union(col("sh_a"), col("sh_b"))))
          .filter(col("jaccard") >= JaccardThreshold)
          .select("doc_a", "doc_b", "jaccard")
          .orderBy("doc_a", "doc_b")
      },
      // brute-force all-pairs oracle: hash-matching it asserts the LSH
      // candidate stage has FULL recall at the threshold on the gate data —
      // a stronger check than rows-only (a recall drop now turns the gate
      // red instead of passing silently)
      s"""WITH $shingleCtes,
         |p AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    cast(len(list_intersect(a.sh, b.sh)) as double) /
         |      len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE len(a.sh) > 0 AND len(b.sh) > 0)
         |SELECT doc_a, doc_b, jaccard FROM p
         |WHERE jaccard >= $JaccardThreshold
         |ORDER BY doc_a, doc_b""".stripMargin),

    // Asymmetric containment scoring: |A∩B|/|A| catches a small document
    // swallowed by a larger one, which symmetric Jaccard under-scores
    // (J = |A|/|B| for A⊂B). Candidates come from the deterministic
    // rare-shingle inverted index (shared with doc_containment_lsh) rather
    // than MinHash banding: Jaccard-tuned bands rarely collide for
    // small-in-large pairs — exactly the pairs containment exists to find —
    // and the exact blocking makes the whole operator SQL-re-derivable, so
    // the oracle hash-checks it instead of a rows-only count.
    "doc_containment" -> Q(
      (s, d) => {
        val sets = hashedShingles(s, d)
        containmentCandidatesCached(s, d)
          .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
            "doc_a")
          .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
            "doc_b")
          // sub-3-token docs have EMPTY shingle sets — guard the divisions
          // or ANSI mode turns 0/0 into a runtime crash
          .filter(size(col("sh_a")) > 0 && size(col("sh_b")) > 0)
          .withColumn("inter",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
          .select(col("doc_a"), col("doc_b"),
            (col("inter") / size(col("sh_a"))).as("containment_a"),
            (col("inter") / size(col("sh_b"))).as("containment_b"),
            (col("inter") / size(array_union(col("sh_a"), col("sh_b"))))
              .as("jaccard"))
          .orderBy("doc_a", "doc_b")
      },
      s"""WITH $shingleCtes,
         |$containmentCandCtes,
         |sc AS (
         |  SELECT doc_a, doc_b,
         |    cast(len(list_intersect(sa.sh, sb.sh)) as double) AS inter,
         |    len(sa.sh) AS la, len(sb.sh) AS lb,
         |    len(list_distinct(list_concat(sa.sh, sb.sh))) AS lu
         |  FROM cand JOIN s sa ON cand.doc_a = sa.doc_id
         |            JOIN s sb ON cand.doc_b = sb.doc_id
         |  WHERE len(sa.sh) > 0 AND len(sb.sh) > 0)
         |SELECT doc_a, doc_b, inter / la AS containment_a,
         |  inter / lb AS containment_b, inter / lu AS jaccard
         |FROM sc ORDER BY doc_a, doc_b""".stripMargin),

    // Containment-aware candidate generation — the piece Jaccard-LSH
    // can't provide: a small doc inside a large one has LOW Jaccard, so
    // minhash bands rarely collide, but it shares ALL its shingles with
    // the container. A rare-shingle inverted index (stop-shingles with
    // df > cutoff pruned BEFORE the self-join, same discipline as the
    // winnowing index) generates candidates whose bucket cost scales
    // with rare-shingle df, then exact containment verifies. Spec:
    // recall vs brute-force all-pairs containment, precision exact.
    "doc_containment_lsh" -> Q(
      (s, d) => {
        val sets = hashedShingles(s, d)
        containmentCandidatesCached(s, d)
          .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
            "doc_a")
          .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
            "doc_b")
          .filter(size(col("sh_a")) > 0 && size(col("sh_b")) > 0)
          .withColumn("inter",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
          .withColumn("containment",
            greatest(col("inter") / size(col("sh_a")),
              col("inter") / size(col("sh_b"))))
          .filter(col("containment") >= ContainmentThreshold)
          .select("doc_a", "doc_b", "containment")
          .orderBy("doc_a", "doc_b")
      },
      s"""WITH $shingleCtes,
         |$containmentCandCtes,
         |sc AS (
         |  SELECT doc_a, doc_b,
         |    cast(len(list_intersect(sa.sh, sb.sh)) as double) AS inter,
         |    len(sa.sh) AS la, len(sb.sh) AS lb
         |  FROM cand JOIN s sa ON cand.doc_a = sa.doc_id
         |            JOIN s sb ON cand.doc_b = sb.doc_id
         |  WHERE len(sa.sh) > 0 AND len(sb.sh) > 0)
         |SELECT doc_a, doc_b, greatest(inter / la, inter / lb) AS containment
         |FROM sc WHERE greatest(inter / la, inter / lb) >= $ContainmentThreshold
         |ORDER BY doc_a, doc_b""".stripMargin),

    // Fuzzy key matching — the entity-resolution shape: short record keys
    // (here the first 24 chars of each doc) pair only within a prefix
    // block (equi-join shuffle keyed on the block, never O(n²)), then the
    // survivors pay the edit-distance verify. Both engines ship the same
    // Levenshtein, so the operator is fully oracled.
    "doc_fuzzy_match" -> Q(
      (s, d) => {
        val keys = Tables.documents(s, d)
          .select(col("doc_id"), substring(col("text"), 1, 24).as("k"))
          .withColumn("blk", substring(col("k"), 1, 8))
        keys
          .join(keys.select(col("doc_id").as("doc_id_b"), col("k").as("k_b"),
            col("blk")), Seq("blk"))
          .filter(col("doc_id") < col("doc_id_b"))
          .withColumn("dist", levenshtein(col("k"), col("k_b")))
          .filter(col("dist") <= 3)
          .select(col("doc_id").as("doc_a"), col("doc_id_b").as("doc_b"),
            col("dist").cast("long").as("dist"))
          .orderBy("doc_a", "doc_b")
      },
      """WITH keys AS (
        |  SELECT doc_id, substring(text, 1, 24) AS k,
        |    substring(text, 1, 8) AS blk
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  cast(levenshtein(a.k, b.k) as bigint) AS dist
        |FROM keys a JOIN keys b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.k, b.k) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin),

    // Exact-substring duplicated-span detection — the distributed shape of
    // suffix-array training-data dedup (ExactSubstr, "Deduplicating
    // Training Data Makes Language Models Better"): any 8-token gram that
    // occurs more than once ANYWHERE in the corpus seeds a duplicated
    // region; per doc, seed positions expand to the tokens they cover and
    // merge into maximal spans (gaps-and-islands), the ranges a span
    // remover would cut. Scale: the only wide ops are the gram-count
    // shuffle and the seed join, both keyed on the gram — cost tracks
    // gram volume (≈ corpus tokens), never pairs; span merging is one
    // per-doc window over covered positions (bounded by doc length). The
    // reference's dedup surface stops at whole-row duplicates
    // (sql/05_merge_canonical.sql:1 merge keys); this is the sub-document
    // extension a 100 TB training corpus needs.
    "doc_dup_spans" -> Q(
      (s, d) => {
        val SpanK = 8
        val toks = docs(s, d)
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
          // guard: Spark's sequence(0, n) generates DESCENDING for n<0
          .filter(size(col("w")) >= SpanK)
        // gram identity = xxhash64 of the 8-token slice, not the joined
        // string: the gram column only ever feeds the count shuffle and
        // the seed join, so keying on the 8-byte hash shuffles ~8× fewer
        // bytes and skips the per-gram string build (guide §2.3). Same
        // discipline as the hashed shingle sets: tokens are whitespace-
        // free, so slice equality ≡ joined-string equality, and a 64-bit
        // collision is absent at oracle scale (it would surface as a hash
        // mismatch there).
        val grams = toks.select(col("doc_id"),
          posexplode(transform(sequence(lit(0), size(col("w")) - SpanK),
            i => xxhash64(slice(col("w"), i + 1, lit(SpanK))))))
          .toDF("doc_id", "pos", "gram")
        val dup = grams.groupBy("gram").count()
          .filter(col("count") > 1).select("gram")
        val covered = grams.join(dup, "gram")
          .select(col("doc_id"),
            explode(sequence(col("pos"), col("pos") + (SpanK - 1))).as("p"))
          .distinct()
        val wd = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("p")
        covered.withColumn("grp", col("p") - row_number().over(wd))
          .groupBy(col("doc_id"), col("grp"))
          .agg(min(col("p")).cast("long").as("span_start"),
            (max(col("p")) + 1).cast("long").as("span_end"),
            count(lit(1)).as("span_tokens"))
          .select("doc_id", "span_start", "span_end", "span_tokens")
          .orderBy("doc_id", "span_start")
      },
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest([{'pos': i - 1,
        |      'g': list_aggregate(w[i:i+7], 'string_agg', ' ')}
        |    for i in generate_series(1, len(w) - 7)]) AS u
        |  FROM toks),
        |g AS (SELECT doc_id, u.pos AS pos, u.g AS gram FROM grams),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
        |seed AS (SELECT doc_id, pos FROM g
        |  WHERE gram IN (SELECT gram FROM dup)),
        |cov AS (SELECT DISTINCT doc_id, pos + t.o AS p
        |  FROM seed, range(0, 8) t(o)),
        |isl AS (SELECT doc_id, p,
        |  p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
        |  FROM cov)
        |SELECT doc_id, cast(min(p) as bigint) AS span_start,
        |  cast(max(p) + 1 as bigint) AS span_end, count(*) AS span_tokens
        |FROM isl GROUP BY doc_id, grp
        |ORDER BY doc_id, span_start""".stripMargin),

    // Keep-first exact-substring dedup — the actionable ExactSubstr
    // contract: of a duplicated 8-gram's occurrences, the corpus-FIRST
    // (min doc_id, then position) survives; every other occurrence's
    // tokens are cut, and the doc re-assembles from its kept tokens. Two
    // identical docs → the lower id unchanged, the higher id fully
    // drained. Same gram-keyed shuffles as doc_dup_spans plus a per-doc
    // re-assembly aggregation. First-occurrence selection is ONE
    // map-side-partial hash aggregate (count + min-struct per gram) and a
    // join-back — deliberately NOT a per-gram sort window: a degenerate
    // boilerplate gram (license header, templated page) with 10^8
    // occurrences would pin row_number() to a single reducer AQE cannot
    // split, while join skew IS AQE-splittable and the aggregate's
    // partial combine bounds per-reducer fan-in by distinct grams.
    "doc_dedup_substr" -> Q(
      (s, d) => {
        val SpanK = 8
        val toks = docs(s, d)
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
        // hashed gram keys — see doc_dup_spans
        val grams = toks.filter(size(col("w")) >= SpanK)
          .select(col("doc_id"),
            posexplode(transform(sequence(lit(0), size(col("w")) - SpanK),
              i => xxhash64(slice(col("w"), i + 1, lit(SpanK))))))
          .toDF("doc_id", "pos", "gram")
        val firstOcc = grams.groupBy("gram")
          .agg(count(lit(1)).as("n"),
            min(struct(col("doc_id"), col("pos"))).as("f"))
          .filter(col("n") > 1)
          .select("gram", "f")
        val removal = grams.join(firstOcc, "gram")
          .filter(struct(col("doc_id"), col("pos")) =!= col("f"))
        val covered = removal
          .select(col("doc_id"),
            explode(sequence(col("pos"), col("pos") + (SpanK - 1))).as("p"))
          .distinct()
        val tok = toks.select(col("doc_id"), posexplode(col("w")))
          .toDF("doc_id", "p", "t")
        val kept = tok.join(covered, Seq("doc_id", "p"), "left_anti")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("kept"),
            array_join(transform(
              array_sort(collect_list(struct(col("p"), col("t")))),
              x => x.getField("t")), " ").as("clean_text"))
        toks.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
          .join(kept, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            (col("n_tokens") - coalesce(col("kept"), lit(0L)))
              .as("removed_tokens"),
            coalesce(col("clean_text"), lit("")).as("clean_text"))
          .orderBy("doc_id")
      },
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest([{'pos': i - 1,
        |      'g': list_aggregate(w[i:i+7], 'string_agg', ' ')}
        |    for i in generate_series(1, len(w) - 7)]) AS u
        |  FROM toks),
        |g AS (SELECT doc_id, u.pos AS pos, u.g AS gram FROM grams),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
        |removal AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |    FROM g WHERE gram IN (SELECT gram FROM dup))
        |  WHERE rn > 1),
        |cov AS (SELECT DISTINCT doc_id, pos + t.o AS p
        |  FROM removal, range(0, 8) t(o)),
        |tok AS (
        |  SELECT doc_id, unnest([{'p': i - 1, 't': w[i]}
        |    for i in generate_series(1, len(w))]) AS u
        |  FROM toks),
        |tk AS (SELECT doc_id, u.p AS p, u.t AS t FROM tok),
        |kept AS (
        |  SELECT tk.doc_id, count(*) AS kept,
        |    string_agg(tk.t, ' ' ORDER BY tk.p) AS clean_text
        |  FROM tk ANTI JOIN cov ON tk.doc_id = cov.doc_id AND tk.p = cov.p
        |  GROUP BY tk.doc_id)
        |SELECT toks.doc_id, cast(len(w) as bigint) AS n_tokens,
        |  cast(len(w) - coalesce(kept.kept, 0) as bigint) AS removed_tokens,
        |  coalesce(kept.clean_text, '') AS clean_text
        |FROM toks LEFT JOIN kept ON toks.doc_id = kept.doc_id
        |ORDER BY toks.doc_id""".stripMargin)
  )
}
