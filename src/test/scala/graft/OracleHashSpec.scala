package graft

import org.scalatest.funsuite.AnyFunSuite

/** Canary values for the JVM↔DuckDB shared hash family. Each constant
  * below was computed INDEPENDENTLY in DuckDB 1.0 from the SQL twins
  * (OracleHash.polySql / permSql); if a refactor shifts any JVM value,
  * this fails before the oracle gate does.
  */
class OracleHashSpec extends AnyFunSuite {

  test("poly-31 canary matches the DuckDB-computed value") {
    // SELECT list_reduce(list_prepend(0, [104,101,108,108,111]),
    //   (acc,c) -> (acc*31+c)%1000000007)  => 99162322
    assert(OracleHash.poly("hello", 0L) == 99162322L)
    assert(OracleHash.poly("", 0L) == 0L)
    // continuation equals hashing the concatenation
    val h1 = OracleHash.polyChar(OracleHash.poly("ab", 0L), 'c')
    assert(h1 == OracleHash.poly("abc", 0L))
  }

  test("permutation constants stay within the no-overflow envelope") {
    (0 until 128).foreach { i =>
      val a = OracleHash.a(i)
      val b = OracleHash.b(i)
      assert(a > 0 && a < OracleHash.P && b >= 0 && b < OracleHash.P)
      // a * h + b for h < P must stay below 2^62
      assert(a * (OracleHash.P - 1) + b < (1L << 62))
    }
    // power-family canaries: perm 0 is UNCHANGED from the pre-R11
    // linear family (A^1 = 1·A), so every perm-0 oracle stays valid;
    // perm 1 matches the constants the R10 graph oracle shipped with
    // (independently exercised through DuckDB all of round 10)
    assert(OracleHash.a(0) == 654435747L && OracleHash.b(0) == 266489896L)
    assert(OracleHash.a(1) == 953445008L && OracleHash.b(1) == 172972768L)
  }

  test("permutation slopes admit no small-integer pairwise relation") {
    // The measured R10 failure mode: the linear family a_i = (i+1)·A
    // satisfies (j+1)·a_i ≡ (i+1)·a_j (mod P) — a small-scalar
    // relation under which all 128 argmins co-move and Jaccard
    // estimates saturate at 0-or-1. The power family must admit NO
    // relation p·a_i ≡ q·a_j (mod P) with 1 ≤ p, q ≤ 256, any pair.
    val P = OracleHash.P
    def modpow(base: Long, e: Long): Long = {
      var r = 1L; var b = base % P; var x = e
      while (x > 0) { if ((x & 1) == 1) r = r * b % P; b = b * b % P; x >>= 1 }
      r
    }
    def smallestRelation(v: Array[Long]): Option[(Int, Int, Long, Long)] = {
      val n = v.length
      var found: Option[(Int, Int, Long, Long)] = None
      var i = 0
      while (i < n && found.isEmpty) {
        var j = i + 1
        while (j < n && found.isEmpty) {
          val ratio = v(i) * modpow(v(j), P - 2) % P // a_i / a_j mod P
          var p = 1L
          while (p <= 256 && found.isEmpty) {
            val q = p * ratio % P // q with p·a_i ≡ q·a_j (mod P)
            if (q >= 1 && q <= 256) found = Some((i, j, p, q))
            p += 1
          }
          j += 1
        }
        i += 1
      }
      found
    }
    // the checker itself catches the OLD family (guards the guard)
    val linear = Array.tabulate(128)(i => OracleHash.MulA * (i + 1) % P)
    assert(smallestRelation(linear).isDefined,
      "the checker must flag the linear family it was built to exclude")
    val aRel = smallestRelation(Array.tabulate(128)(OracleHash.a))
    assert(aRel.isEmpty, s"a-family small relation: $aRel")
    val bRel = smallestRelation(Array.tabulate(128)(OracleHash.b))
    assert(bRel.isEmpty, s"b-family small relation: $bRel")
  }

  test("winnowing fingerprint canaries are stable") {
    // values pinned from the current implementation — any change to
    // k-gram hashing, windowing, or the xor fold must be deliberate
    // (and mirrored in OracleSql.fingerprint)
    assert(operators.TextAnalysis.winnowFingerprint("the quick brown fox")
      == 26453762350L)
    assert(operators.TextAnalysis.winnowFingerprint("short") == 0L)
  }

  test("non-BMP text hashes by code point, matching DuckDB") {
    // 3 supplementary code points (😀 U+1F600, 𝄞 U+1D11E, 🚀 U+1F680):
    // 28 code points but 31 UTF-16 units — a UTF-16 loop diverges here.
    // Both constants computed independently in DuckDB 1.0 from the SQL
    // twins (polySql / OracleSql.fingerprint).
    val s = "emoji 😀𝄞 test naïve 🚀 rocket"
    assert(OracleHash.poly(s, 0L) == 414095170L)
    assert(operators.TextAnalysis.winnowFingerprint(s) == 187265598L)
  }

  test("-0.0 canary: the driver hash sees the sign bit of zero") {
    // compare.py hashes raw value bytes, so -0.0 != +0.0 there even
    // though `-0.0 == 0.0` in every numeric comparison. Two rules keep
    // oracles safe: (1) Spark's round() goes through BigDecimal and can
    // NEVER emit -0.0, so any oracle column built with round(...) on a
    // possibly-negative argument needs `+ 0.0` on the DuckDB side
    // (IEEE: -0.0 + 0.0 = +0.0; exact identity for every other value);
    // (2) engine expressions that must be IEEE-faithful (Cypher
    // ceil/floor) preserve the sign via `x * 0.0` at zero.
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    assert(bits(-0.0) != bits(0.0))       // the hazard exists
    assert(-0.0 == 0.0)                   // ...and comparisons hide it
    assert(bits(-0.0 + 0.0) == bits(0.0)) // the oracle-side normalizer
    assert(bits(-0.25 * 0.0) == bits(-0.0)) // the engine-side restorer
    assert(bits(BigDecimal(-1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble) == bits(0.0)) // Spark round never yields -0.0
  }
}
