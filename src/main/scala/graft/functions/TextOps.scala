package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives (tokenize, shingle, MinHash, SimHash, winnowing)
  * as pure Column expressions — map-only, no UDFs, no driver state. Every
  * hash is seeded deterministically so signatures are reproducible across
  * runs and cluster layouts.
  */
object TextOps {

  /** Whitespace tokens of already-clean text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Subword BPE tokens under the fixture merges table — the faithful
    * token accounting for chunk/shard statistics (see [[Bpe]]).
    */
  def bpeTokens(text: Column): Column = Bpe.tokens(text)

  /** Normalized text for exact dedup: lowercase, collapsed whitespace. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Word n-gram size for the dedup family. Unigrams make any vocabulary
    * overlap look like similarity (avg cross-doc Jaccard ~0.6 on prose),
    * flooding LSH buckets; 3-grams drive the cross-doc baseline to ~0 so
    * candidate volume scales with TRUE near-dups — the cost driver at
    * 100 TB.
    */
  val ShingleN = 3

  /** Distinct word-3-gram shingle set over a BOUND tokens column (the
    * ngrams lambda re-evaluates `toks` per element if handed an inline
    * tokenizer — bind `tokens(text)` as its own column first).
    */
  def shingles(toks: Column): Column = array_distinct(ngrams(toks, ShingleN))

  /** Convenience for tests/small inputs ONLY: inlines the tokenizer into
    * the ngram lambda (quadratic re-tokenization — never in a hot path).
    */
  def shingleSet(text: Column): Column = shingles(tokens(text))

  /** Word n-grams as space-joined strings. Pass a BOUND column (not an
    * inlined tokenizer expression): the lambdas reference `toks` per
    * element, so an inlined split would re-run once per token.
    */
  def ngrams(toks: Column, n: Int): Column =
    filter(
      transform(toks, (_, i) => array_join(slice(toks, i + 1, lit(n)), " ")),
      (_, i) => i <= size(toks) - n)

  // ------------------------------------------------------------------
  // MinHash
  // ------------------------------------------------------------------

  /** K-long MinHash signature of a shingle set: ONE xxhash64 pass over the
    * shingles, then K affine permutations with running minima inside a
    * single codegen'd loop (MinHashFromHashes).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    HashExprs.minhash(transform(shingles, x => xxhash64(x)), k)

  /** LSH band hashes: signature split into `bands` equal slices, each slice
    * hashed with its band index (same band+hash → candidate bucket).
    */
  def bandHashes(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b), slice(sig, b * rows + 1, rows)).as("band_hash"))
    }: _*)
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash over term-frequency-weighted token hashes: bit j is set
    * when Σ_tokens (±1 per token-hash bit j) > 0. One xxhash64 pass; the 64
    * bit-votes fold in a single codegen'd loop (SimHashFromHashes).
    */
  def simhash64(toks: Column): Column =
    HashExprs.simhash(transform(toks, t => xxhash64(t)))

  /** 16-bit chunks of a SimHash: hamming distance ≤ 3 over 64 bits implies
    * at least one of the 4 chunks is equal (pigeonhole), so an equi-join on
    * (chunk_idx, chunk) is an EXACT blocking for d ≤ 3 — no O(n²) compare.
    */
  def simhashChunks(sh: Column): Column =
    array((0 until 4).map { c =>
      struct(lit(c).as("chunk_idx"),
        shiftright(sh, 16 * c).bitwiseAND(lit(0xFFFFL)).as("chunk"))
    }: _*)

  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ------------------------------------------------------------------
  // Winnowing fingerprints
  // ------------------------------------------------------------------

  /** Rolling k-gram hashes of a text column. Materialize this as its own
    * column BEFORE windowing with `winnowFromHashes`: a lambda body re-
    * evaluates everything inside it per element, so inlining the hash array
    * into the window transform is O(n²) re-hashing.
    */
  def kgramHashes(text: Column, k: Int): Column =
    transform(sequence(lit(1), greatest(length(text) - lit(k - 1), lit(1))),
      i => xxhash64(text.substr(i, lit(k))))

  /** Winnowing (Schleimer et al., SIGMOD'03) over a BOUND hash-array
    * column: min hash of every w-window, deduplicated — the classic
    * document fingerprint set.
    */
  def winnowFromHashes(hs: Column, w: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(hs) - lit(w - 1), lit(1))),
      j => array_min(slice(hs, j, lit(w)))))

  /** One-shot winnow for SMALL inputs (tests): inlines the hash array into
    * the window lambda — quadratic, do not use on a corpus.
    */
  def winnow(text: Column, k: Int, w: Int): Column =
    winnowFromHashes(kgramHashes(text, k), w)
}
