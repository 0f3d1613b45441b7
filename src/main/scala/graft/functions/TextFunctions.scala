package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline column functions (pure `org.apache.spark.sql.functions`
  * compositions — codegen'd, no UDFs, so whole-stage codegen and column
  * pruning survive; the 100 TB hot path stays vectorized).
  *
  * Every function here is paired with an equivalent DuckDB SQL formula in
  * SparkEntry.oracleSql, so formulas are chosen to be portable: plain
  * splits, ASCII arithmetic, explicit modular rolling hashes.
  */
object TextFunctions {

  /** Whitespace tokens. Single-space split for exact oracle parity with
    * DuckDB's string_split(text, ' '). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish tokenizer pattern (GPT-2 style, simplified to stay inside
    * the RE2 subset so the DuckDB oracle runs the SAME pattern):
    * contraction suffixes, space-prefixed letter runs, digit runs, and
    * punctuation runs. No lookaheads (RE2 has none). */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+"

  /** Sub-word-ish tokens via [[bpePattern]] — the "how many tokens will
    * the model see" estimator (whitespace tokens undercount ~30%). Pure
    * codegen'd regexp_extract_all: linear scan per row, no shuffle. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  /** Distinct word n-gram shingles (MinHash/Jaccard feature set) — the
    * codegen'd [[WordShingles]] expression (the HOF formulation re-runs
    * `split` inside the lambda on every element; see its Scaladoc). */
  def shingles(text: Column, n: Int = 3): Column = WordShingles(text, n)

  /** Exact Jaccard similarity of two (distinct-element) arrays.
    * Two empty sets score 0.0 (not NaN from 0/0) — same convention as
    * [[VectorFunctions.cosine]]'s zero-vector guard. */
  def jaccard(a: Column, b: Column): Column = {
    val union = size(array_union(a, b)).cast("double")
    val inter = size(array_intersect(a, b)).cast("double")
    when(union === 0.0, 0.0).otherwise(inter / union)
  }

  /** MinHash signature — the codegen'd [[MinHashSig]] expression (see its
    * Scaladoc for why the higher-order-function formulation is a trap). */
  def minhashSignature(shingleSet: Column, h: Int = 128): Column =
    MinHashSig(shingleSet, h)

  /** LSH band keys for a minhash signature: `bands` structs of
    * (band index, hash of the signature slice). Docs sharing any band
    * key are near-dup candidates. */
  def minhashBands(sig: Column, bands: Int, rowsPerBand: Int): Column = {
    require(bands >= 1 && rowsPerBand >= 1,
      s"need bands >= 1 and rowsPerBand >= 1 (got $bands x $rowsPerBand): " +
      "rowsPerBand = 0 makes every band key constant and LSH degenerates " +
      "into an all-pairs join")
    // runtime guard: a signature shorter than bands*rowsPerBand would
    // make the overrunning bands slice EMPTY — one constant key shared
    // by every document, the same all-pairs degeneration as
    // rowsPerBand = 0, but silent. Signature length is only known at
    // runtime, so the check rides the expression (constant-folded
    // comparison, no measurable cost).
    val need = bands * rowsPerBand
    val checked = when(sig.isNull, sig) // null signature stays null
      .when(size(sig) >= need, sig)
      .otherwise(raise_error(
        concat(lit(s"minhashBands: signature has "),
               size(sig).cast("string"),
               lit(s" hashes, need >= $need ($bands bands x $rowsPerBand)"))))
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
             hash(slice(checked, b * rowsPerBand + 1, lit(rowsPerBand)))
               .as("key")))
  }

  /** Two independent 31-bit modular polynomial hashes over the characters
    * of `s`, packed into one 62-bit value `h1 * 2^31 + h2`. Portable: the
    * exact same fold runs as a DuckDB `list_reduce` in the oracle SQL
    * (ASCII input assumed — codepoint vs byte differences would diverge
    * on non-ASCII). Bounded < 2^62: ANSI-safe.
    *
    * Column-expression form of [[PortableHash.h62]] — the constants MUST
    * stay in lockstep (see PortableHash's Scaladoc; FunctionsSpec pins
    * the equality against [[SimHash62]]). */
  def polyHash62(s: Column): Column = {
    // guard: sequence(1, 0) STEPS DOWN in Spark ([1, 0]) — an empty
    // string must fold over no chars, not two phantom zero-codes.
    // A null string propagates to a null hash (null-array aggregate),
    // matching [[SimHash62]]'s treatment of null features as signal-free
    // rather than hashing them as empty.
    val codes = when(s.isNull, lit(null).cast("array<bigint>"))
      .when(length(s) > 0,
        transform(sequence(lit(1), length(s)), i =>
          ascii(s.substr(i, lit(1))).cast("long")))
      .otherwise(array().cast("array<bigint>"))
    val h1 = aggregate(codes, lit(7L),
      (a, c) => (a * 31L + c) % 2147483647L)
    val h2 = aggregate(codes, lit(11L),
      (a, c) => (a * 37L + c) % 2147483629L)
    h1 * 2147483648L + h2
  }

  private val bitLit: Column =
    typedlit((0 until 62).map(j => 1L << j))

  /** 62-bit SimHash over a feature array: per-bit ±1 votes of each
    * feature's [[polyHash62]], assembled with bitwise OR. Fully portable
    * to the DuckDB oracle (same hash, same votes). `hashes` must be a
    * materialized column of `transform(features, polyHash62)`. */
  def simhash62FromHashes(hashes: Column): Column = {
    val votes = aggregate(
      // null hashes (null features through [[polyHash62]]) carry no
      // signal — same skip rule as the native [[SimHash62]] loop
      filter(hashes, h => h.isNotNull),
      array_repeat(lit(0L), 62),
      (acc, h) =>
        zip_with(acc, bitLit, (a, p) =>
          a + when(h.bitwiseAND(p) =!= 0, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, bitLit, (v, p) => when(v > 0, p).otherwise(0L)),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x))
  }

  /** 16-bit band of a 62-bit simhash (4 bands — the top one is 14 bits;
    * two near-dups within hamming distance 3 agree on at least one). */
  def simhashBand(sim: Column, band: Int): Column =
    shiftright(sim, band * 16).bitwiseAND(lit(0xFFFFL))

  /** Portable per-token hash: 31*len + ascii(first char). Matches the
    * DuckDB oracle formula exactly. */
  private def tokenHash(t: Column): Column =
    lit(31L) * length(t) + ascii(substring(t, 1, 1))

  /** Rolling polynomial document fingerprint over tokens,
    * fold((acc*31 + tokenHash) mod 2^31-1) from 7. */
  def fingerprint(toks: Column): Column =
    aggregate(toks, lit(7L),
      (acc, t) => (acc * 31L + tokenHash(t)) % 2147483647L)

  /** Language marker-word hit counts (counts, not distinct — frequency
    * matters). SQL-portable: a filter over tokens. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  def langScore(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isInCollection(langMarkers(lang))))

  /** Heuristic language ID: argmax of marker-word counts, fixed priority
    * order en>de>fr>es on ties, 'unknown' when all zero, null for null
    * input (missing text must stay distinguishable from marker-free
    * text). */
  def langId(toks: Column): Column = {
    val s = Seq("en", "de", "fr", "es").map(l => l -> langScore(toks, l))
    val best = greatest(s.map(_._2): _*)
    val classified = s.foldLeft(when(best === 0, "unknown")) {
      case (acc, (l, sc)) => acc.when(sc === best, l)
    }.otherwise("unknown")
    when(toks.isNull, lit(null).cast("string")).otherwise(classified)
  }
}
