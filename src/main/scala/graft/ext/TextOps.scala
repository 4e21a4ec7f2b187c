package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus curation: tokenization,
  * shingling, MinHash signatures, SimHash fingerprints, quality metrics.
  * All hashing is md5-based (available and bit-identical in every engine we
  * oracle against) and every scalar stays inside whole-stage codegen — no
  * UDFs anywhere on the hot path.
  */
object TextOps {

  /** Whitespace tokens, lowercased. Fixture texts are single-space
    * separated; a production corpus would swap in a regex tokenizer here.
    */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Word n-gram shingles (space-joined) over a tokens column (by name),
    * e.g. n=3 for near-dup Jaccard. Short docs yield an empty set (never a
    * descending `sequence`, which Spark would happily generate).
    */
  def shingles(toksCol: String, n: Int): Column =
    expr(s"""CASE WHEN size($toksCol) >= $n
            | THEN transform(sequence(0, size($toksCol) - $n),
            |                i -> array_join(slice($toksCol, i + 1, $n), ' '))
            | ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)

  /** Row-j Count-Min bucket for a token: 8 hex chars of md5(tok) —
    * digit window [8j, 8j+8) — folded to [0, w). ONE digest serves all
    * d=4 rows (md5's 32 hex chars split exactly into four 32-bit
    * windows), so the per-token hashing cost is a quarter of the
    * hash-per-row form; Spark's subexpression elimination computes the
    * shared md5 once per token. Stated deviation from the textbook
    * "d independent hash functions": the rows are disjoint bit-windows
    * of one digest (the standard one-digest derivation used by
    * production sketch libraries). CMS's estimate≥truth dominance —
    * the property the oracle proves bit-exactly — holds for ANY bucket
    * function; only the error-bound constant assumes independence, and
    * the d·w error gate in HeavyHittersSpec checks the realized error
    * directly. Shared by the batch sketch (ExtQueries.cmsCounts) and
    * its streaming twin, which must land tokens in the SAME buckets.
    */
  def cmsBucket(j: Int, w: Int, tok: Column): Column = {
    // md5 yields exactly four 8-hex-char windows; j outside [0, 4) would
    // substring past the digest, conv() would return null, and the
    // sketch would corrupt silently — fail loudly if CmsD is ever raised
    // without moving to a wider digest
    require(j >= 0 && j < 4,
      s"cmsBucket row $j out of md5's four 32-bit windows; " +
        "raising d needs a wider digest (e.g. sha2) for disjoint windows")
    conv(substring(md5(tok), 8 * j + 1, 8), 16, 10)
      .cast("long") % w
  }

  /** Misra–Gries frequent-items summary over one partition's item
    * stream: at most `k` counters; every item whose count in the stream
    * exceeds streamLength/k is guaranteed to hold a counter at the end
    * (classic MG bound — each decrement event removes k+1 occurrences,
    * so an item with more than n/k occurrences cannot be decremented to
    * zero every time it appears). Returns the surviving keys only: the
    * summary is a CANDIDATE set, deliberately partition-dependent, and
    * every consumer must re-count candidates exactly before filtering —
    * which is what makes the downstream result partition-independent.
    * Per-partition summaries compose by the averaging argument: an item
    * with global count > n/k has count > n_p/k in at least one
    * partition, so the union of partition summaries is a superset of
    * the global heavy hitters for the same k.
    *
    * This is one of the two sanctioned `mapPartitions` seams (the other
    * is the multimodal codec): a bounded-memory streaming summary has
    * no relational form — expressing it as groupBy would be the exact
    * full-shuffle aggregation the summary exists to avoid.
    */
  def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    while (it.hasNext) {
      val t = it.next()
      m.get(t) match {
        case Some(c) => m.update(t, c + 1L)
        case None if m.size < k => m.update(t, 1L)
        case None =>
          // decrement-all: one occurrence of each of the k held items
          // plus the arriving item vanish together (k+1 per event)
          for (key <- m.keys.toArray) {
            val c = m(key)
            if (c == 1L) m.remove(key) else m.update(key, c - 1L)
          }
      }
    }
    m.keysIterator
  }

  /** 16-bit SimHash over a token stream: per-bit ±1 votes weighted by
    * token multiplicity, bit set where the vote is positive. 16 bits keeps
    * the oracle SQL tractable; widening to 64 is the same expression ×4.
    */
  def simhashBitVotes(tokenHash: Column, bit: Int): Column =
    sum(when((shiftright(tokenHash, bit).bitwiseAND(1)) === 1, 1).otherwise(-1))

  /** token → 16-bit integer hash (first 4 hex chars of md5). */
  def tokenHash16(token: Column): Column =
    conv(substring(md5(token), 1, 4), 16, 10).cast("int")

  /** token → `bits`-bit integer hash (first bits/4 hex chars of md5,
    * the only hash both engines spell identically). bits must be a
    * multiple of 4 and ≤ 60 so the value stays a non-negative long.
    */
  def tokenHashBits(token: Column, bits: Int): Column = {
    require(bits % 4 == 0 && bits <= 60, s"bad simhash width $bits")
    conv(substring(md5(token), 1, bits / 4), 16, 10).cast("long")
  }

  /** Document-quality metrics (SURVEY-style curation heuristics): all
    * integer-derived, so the downstream ratios are bit-deterministic.
    */
  def qualityColumns(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val nWords = size(toks)
    val nChars = length(text)
    val nLetters = length(regexp_replace(text, " ", ""))
    val nStop = size(filter(toks, t => t === "the" || t === "a"))
    val nUniq = size(array_distinct(toks))
    Seq(
      nChars.as("n_chars"),
      nWords.as("n_words"),
      (nLetters.cast("double") / nWords).as("avg_word_len"),
      (nStop.cast("double") / nWords).as("stopword_ratio"),
      (nUniq.cast("double") / nWords).as("uniq_ratio"))
  }

  /** PII patterns shared VERBATIM with the DuckDB oracle — restricted to
    * the regex subset whose semantics agree between Java regex (Spark)
    * and RE2 (DuckDB): character classes, bounded/unbounded repetition,
    * no backreferences, no lookaround.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Replace every match with a redaction token. (Spark regexp_replace
    * is global by default; the DuckDB oracle needs the 'g' flag.)
    */
  def scrub(text: Column, pattern: String, token: String): Column =
    regexp_replace(text, pattern, token)

  /** Number of matches of `pattern` in `text`. */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Sliding-window token chunks — the retrieval/packing primitive: windows
    * of `size` tokens starting every `size - overlap` tokens, so adjacent
    * chunks share exactly `overlap` tokens (the final tail window may be
    * shorter, never empty). A document with ≤ `size` tokens is one chunk.
    * Pure per-row HOFs (sequence → transform → slice): the chunk stage is
    * map-only, so at 100 TB it pipelines inside the scan with no shuffle —
    * chunk counts per doc obey Σ n_tokens = n + overlap·(n_chunks − 1),
    * which the spec asserts as the coverage identity.
    */
  def chunkWindows(toksCol: String, size: Int, overlap: Int): Column = {
    require(size > overlap && overlap >= 0, s"bad chunk window $size/$overlap")
    val s = size - overlap
    expr(s"""transform(
            |  sequence(0, CASE WHEN size($toksCol) <= $size THEN 0
            |                   ELSE ((size($toksCol) - $size + ${s - 1}) div $s)
            |              END),
            |  k -> slice($toksCol, k * $s + 1, $size))""".stripMargin)
  }

  /** Content fingerprint: md5 of the whitespace-normalized lowercase text.
    * Equal fingerprints ⇒ byte-identical normalized content (exact dedup
    * key).
    */
  def fingerprint(text: Column): Column =
    substring(md5(regexp_replace(lower(text), " ", "")), 1, 16)

  /** Polynomial rolling hash over the character stream (base 31, modulus
    * 1e9+7) — the classic streaming fingerprint: incremental, order-
    * sensitive, pure integer math. Each character contributes its UTF-8
    * bytes as one big-endian integer: `ascii()` would be engine-specific
    * for non-ASCII (Spark collapses to '?', DuckDB yields the code
    * point), while the UTF-8 byte encoding is identical everywhere.
    */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(
        // Spark's split('') emits a trailing "" (DuckDB's doesn't) —
        // drop it or its NULL byte-value poisons the fold
        filter(split(lower(text), ""), c => c =!= ""),
        c => conv(hex(encode(c, "UTF-8")), 16, 10).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31L + c) % 1000000007L)
}
