package graft.functions

/** THE portable polynomial hash constants — single source of truth.
  *
  * These folds are oracle-parity-critical: the identical arithmetic runs
  * as DuckDB `list_reduce` folds in `SparkEntry.oracleSql` (q23, q41)
  * and as the column-function [[TextFunctions.polyHash62]]. Changing any
  * constant here without changing every oracle breaks bit-for-bit
  * cross-engine reproducibility.
  *
  * "Char" means Java char / DuckDB `ascii()` of a 1-char substring —
  * identical for ASCII; non-ASCII text diverges (codepoint vs UTF-16)
  * and is out of scope for the oracle corpus.
  */
object PortableHash {

  /** fold(7,  (a,c) => (a*31 + c) mod 2147483647) over chars. */
  def h31(s: CharSequence): Long = {
    var a = 7L
    var i = 0
    val n = s.length
    while (i < n) { a = (a * 31L + s.charAt(i)) % 2147483647L; i += 1 }
    a
  }

  /** fold(11, (a,c) => (a*37 + c) mod 2147483629) over chars. */
  def h31b(s: CharSequence): Long = {
    var a = 11L
    var i = 0
    val n = s.length
    while (i < n) { a = (a * 37L + s.charAt(i)) % 2147483629L; i += 1 }
    a
  }

  /** 62-bit pack: h31 * 2^31 + h31b. */
  def h62(s: CharSequence): Long = h31(s) * 2147483648L + h31b(s)
}
