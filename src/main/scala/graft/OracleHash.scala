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

  /** How many permutations the precomputed power tables cover —
    * far above any signature width in use (128 perms, 60 SimHash
    * bits, 4 CMS rows).
    */
  val MaxPerms = 4096

  // POWER-CONSTANT permutation family: a(i) = MulA^(i+1) mod P,
  // b(i) = MulB^(i+1) mod P. The former linear family
  // a(i) = (i+1)·MulA factored every member as h_i = (i+1)·h_1 mod P —
  // 128 small-integer scalar multiples of ONE permutation, whose
  // per-permutation argmins co-move (measured: est-Jaccard saturation
  // at 0-or-1 on the graph MinHash twin, Algorithms.scala
  // neighborSimApproxQuery, before its R10 power fix). Consecutive
  // power-family members differ by the LARGE multiplier MulA ≈ 2^31,
  // so argmins decorrelate via mod-P wraparound; OracleHashSpec pins
  // the no-small-scalar-relation property for all 128×128 pairs.
  // P prime and MulA, MulB coprime to P ⇒ every power is nonzero.
  private val aPows: Array[Long] =
    Iterator.iterate(MulA % P)(x => (x * MulA) % P).take(MaxPerms).toArray
  private val bPows: Array[Long] =
    Iterator.iterate(MulB % P)(x => (x * MulB) % P).take(MaxPerms).toArray

  /** Permutation multiplier for index i: MulA^(i+1) mod P (never 0). */
  def a(i: Int): Long = aPows(i)

  /** Permutation addend for index i: MulB^(i+1) mod P. */
  def b(i: Int): Long = bPows(i)

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

  /** The DuckDB expression for permutation `i` (a compile-time
    * constant) applied to BIGINT expression `h`. The power constants
    * are PRECOMPUTED here and inlined as literals — SQL recomputing
    * A^(i+1) per row would be both slow and a second implementation
    * that could drift.
    */
  def permSql(i: Int, h: String): String =
    s"(${a(i)} * ($h) + ${b(i)}) % $P"

  /** A VALUES relation enumerating permutations 0..n-1 with their
    * power constants, usable directly in a FROM/CROSS JOIN position:
    * `perms(p, pa, pb)`. Oracle SQL that permutes by a COLUMN index
    * joins this table and computes `(pa * h + pb) % P` (see
    * [[permJoinedSql]]) — the same constants the JVM loops read via
    * [[a]]/[[b]], so the two paths cannot drift.
    */
  def permTableSql(n: Int): String = {
    require(n <= MaxPerms, s"permTableSql($n) beyond precomputed $MaxPerms")
    (0 until n).map(i => s"($i, ${a(i)}, ${b(i)})")
      .mkString("(VALUES ", ", ", ") AS perms(p, pa, pb)")
  }

  /** The permutation expression over a joined [[permTableSql]] row's
    * `pa`/`pb` columns.
    */
  def permJoinedSql(h: String): String = s"(pa * ($h) + pb) % $P"
}
