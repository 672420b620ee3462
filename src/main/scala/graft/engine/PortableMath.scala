package graft.engine

/** Portable EXACT integer square root, shared textually by the Spark
  * queries and their DuckDB oracle mirrors.
  *
  * Why it exists: the last known cross-engine divergence class was the
  * float PROJECTION of a widened (>int64) moment — DuckDB 1.0 casts
  * HUGEINT→DOUBLE with a double-rounding (1 ulp off on ~0.7% of values
  * above 2^63) while Spark's decimal→double is correctly rounded, so
  * any declared DOUBLE column computed from an int128 moment could go
  * hash-red at astronomic scales. The fix is to never DECLARE such a
  * float: z-score-shaped outputs become fixed-point integers whose only
  * float excursion is a *seed estimate* that an exact integer
  * correction ladder repairs.
  *
  * The idiom: `r0 = floor(sqrt(double(t)))` is computed in whatever
  * conversion semantics the engine has, then adjusted by comparing the
  * EXACT integer squares (r0−1)², r0², (r0+1)², (r0+2)² against t. For
  * any t < 2^106 the float seed is within ±2 of the true isqrt even
  * under a 1-ulp conversion error (error ≤ √t·2^−52 + 0.5 ulp of the
  * sqrt result < 2 while √t < 2^53), so the ladder lands on the exact
  * ⌊√t⌋ in BOTH engines regardless of how each converts int128 to
  * double. The declared output therefore never rides an engine's
  * int128→double cast.
  *
  * Both fragments are pure SQL-92 text valid in Spark SQL and DuckDB;
  * callers bind `t` and the estimate to columns/CTE fields first (the
  * ladder references its operands several times) and pass the engine's
  * wide integer type name — `DECIMAL(38,0)` (Spark) / `HUGEINT`
  * (DuckDB) — so the ladder's squares stay exact past int64.
  */
object PortableMath {

  /** Largest t for which [[isqrt]] is guaranteed exact: 2^106 (the
    * float seed is then within ±2 of ⌊√t⌋ — see the object scaladoc).
    * ≈ 8.1·10^31; every caller's t is bounded far below it.
    */
  val IsqrtExactBound: BigInt = BigInt(2).pow(106)

  /** Float-seeded estimate of ⌊√t⌋, to bind as a column before
    * applying [[isqrtAdjust]]. `wide` is the engine's wide integer
    * type (`DECIMAL(38,0)` / `HUGEINT`); the cast back is exact
    * because √t < 2^53 keeps the floored double integral.
    */
  def isqrtEstimate(t: String, wide: String): String =
    s"CAST(floor(sqrt(CAST(($t) AS DOUBLE))) AS $wide)"

  /** Exact ⌊√t⌋ given a bound estimate column `r0` from
    * [[isqrtEstimate]]: a ±2 correction ladder of exact integer
    * square comparisons (the `r0 > 0` guard keeps t = 0 from taking
    * the (r0−1)² branch). Exact for 0 ≤ t < [[IsqrtExactBound]].
    */
  def isqrtAdjust(r0: String, t: String): String =
    s"($r0" +
      s" + (CASE WHEN ($r0 + 1) * ($r0 + 1) <= ($t) THEN 1 ELSE 0 END)" +
      s" + (CASE WHEN ($r0 + 2) * ($r0 + 2) <= ($t) THEN 1 ELSE 0 END)" +
      s" - (CASE WHEN $r0 * $r0 > ($t) THEN 1 ELSE 0 END)" +
      s" - (CASE WHEN $r0 > 0 AND ($r0 - 1) * ($r0 - 1) > ($t)" +
      s"      THEN 1 ELSE 0 END))"

  /** Reference ⌊√t⌋ for specs (Newton on BigInt — independent of any
    * engine's float path).
    */
  def isqrtRef(t: BigInt): BigInt = {
    require(t >= 0, s"isqrtRef of negative $t")
    if (t == 0) BigInt(0)
    else {
      var x = BigInt(1) << ((t.bitLength + 1) / 2)
      var y = (x + t / x) >> 1
      while (y < x) { x = y; y = (x + t / x) >> 1 }
      x
    }
  }
}
