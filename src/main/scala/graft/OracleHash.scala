package graft

/** The integer hash family shared between JVM operators and their
  * DuckDB oracle SQL. Every operation keeps intermediate values below
  * 2^62 in 64-bit signed arithmetic — no wrap-around — so any ANSI SQL
  * engine (including one with overflow checking) computes bit-identical
  * values from the same formulas:
  *
  *  - base string hash: `h = (h*31 + codepoint) mod P` folded over the
  *    string's CODE POINTS (matching DuckDB's `unicode(substr(...))`,
  *    which yields code points — see [[poly]]);
  *  - permutation i: `(a(i)*h + b(i)) mod P` — a 2-universal
  *    multiply-add family.
  *
  * This replaces xxhash64-based hashing in the MinHash/SimHash
  * signature paths (xxhash64 exists only inside Spark, so results were
  * not oracle-checkable).
  */
object OracleHash {
  /** Modulus: largest 10-digit prime < 2^30, so products with 32-bit
    * multipliers stay < 2^62.
    */
  val P = 1000000007L

  /** Knuth multiplicative-hash constants (< 2^32). */
  val MulA = 2654435761L
  val MulB = 3266489917L

  /** Permutation multiplier for index i (never 0 for i < P-1). */
  def a(i: Int): Long = (MulA * (i + 1)) % P

  /** Permutation addend for index i. */
  def b(i: Int): Long = (MulB * (i + 1)) % P

  /** One poly-31 step: `(h*31 + cp) mod P`, where `cp` is a full Int
    * code point (callers passing a `Char` get the BMP code point via
    * the implicit widening, which is correct for BMP chars; non-BMP
    * input must pass the code point, not a surrogate).
    */
  @inline def polyChar(h: Long, cp: Int): Long = (h * 31 + cp) % P

  /** Poly-31 hash of `s` continuing from `h0` (fold left over CODE
    * POINTS — the DuckDB twin is a `list_reduce` over
    * `unicode(substr(...))`, which yields code points, so the JVM loop
    * must step by code point too or non-BMP characters diverge).
    */
  def poly(s: String, h0: Long): Long = {
    var h = h0
    var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      h = (h * 31 + cp) % P
      j += Character.charCount(cp)
    }
    h
  }

  /** The DuckDB expression computing [[poly]] of SQL string expression
    * `expr` (starting from 0) — kept next to the JVM loop so the two
    * can only drift visibly.
    */
  def polySql(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, len($expr)+1), " +
      s"j -> CAST(unicode(substr($expr, CAST(j AS INT), 1)) AS BIGINT))), " +
      s"(acc, c) -> (acc*31+c)%$P)"

  /** The DuckDB expression for permutation `i` applied to BIGINT
    * expression `h` (i is a SQL expression too).
    */
  def permSql(i: String, h: String): String =
    s"((($MulA*(($i)+1))%$P) * ($h) + ($MulB*(($i)+1))%$P) % $P"
}
