package graft.functions

/** Jaro-Winkler similarity, DuckDB-parity formulation (standalone object
  * so the JVM emits a static forwarder — generated code calls
  * `graft.functions.JaroWinklerAlgo.similarity(...)` directly).
  *
  * Semantics pinned empirically against DuckDB 1.0's
  * `jaro_winkler_similarity` (bit-identical on 14k randomized pairs):
  *   - either input empty → 0.0 (including both empty);
  *   - Jaro match window `max(n1,n2)/2 - 1` (floored at 0), greedy
  *     left-to-right matching, transpositions halved;
  *   - Winkler boost only when jaro > 0.7: `j + l·0.1·(1−j)` with `l`
  *     the common prefix capped at 4.
  * The floating-point operation ORDER matches that reference —
  * `(m/n1 + m/n2 + (m−t)/m) / 3`, then `j + (l·0.1)·(1−j)` — so
  * threshold comparisons agree bit-for-bit cross-engine.
  */
object JaroWinklerAlgo {

  def similarity(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) j
    else {
      var l = 0
      val cap = math.min(4, math.min(s1.length, s2.length))
      while (l < cap && s1.charAt(l) == s2.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }

  def jaro(s1: String, s2: String): Double = {
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var matches = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    (matches.toDouble / n1 + matches.toDouble / n2 +
      (matches - t).toDouble / matches) / 3
  }
}
