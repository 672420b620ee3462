package graft.engine

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing for the dedup/fingerprint operators.
  *
  * Spark's native hash functions (murmur3 `hash`, `xxhash64`) have no
  * DuckDB equivalent, so oracle-verified queries use an MD5-derived
  * 28-bit integer hash instead: MD5 is standardized, both engines emit
  * the same lowercase hex, and 7 hex digits fit integer arithmetic with
  * headroom (a*x+b stays far below 2^63 for 32-bit constants `a`).
  *
  * At 100 TB scale a caller can swap [[h28]] for [[fast28]] (xxhash64)
  * via the `hash` parameter on the TextOps signature-pipeline entry
  * points — the pipeline shape is identical; only the hash family
  * changes (measured gap recorded in SCALE.md).
  */
object PortableHash {

  /** Largest prime below 2^28 — modulus for all derived hash families. */
  val P: Long = 268435399L

  /** 12 (a, b) pairs for the MinHash family h_j(x) = (a_j·x + b_j) mod P. */
  val A: Seq[Long] = Seq(1103515245L, 2654435761L, 1000003L, 10000019L,
    999999937L, 805306457L, 402653189L, 201326611L, 100663319L, 50331653L,
    25165843L, 12582917L)
  val B: Seq[Long] = Seq(12345L, 97L, 1009L, 10007L, 100003L, 65537L,
    257L, 8191L, 524287L, 131071L, 7919L, 104729L)

  /** First 7 hex digits of md5 as a long in [0, 2^28) — computed by the
    * native [[graft.functions.Md5Prefix28]] expression (value-identical
    * to `conv(substring(md5(c), 1, 7), 16, 10)`, which remains the
    * DuckDB-side formulation in [[duckH28]], but without the hex-string
    * round-trip per row). */
  def h28(c: Column): Column = graft.functions.Md5Prefix28.h28(c)

  /** Production hash family: xxhash64 truncated to 28 bits (bitwise
    * AND keeps the value in [0, 2^28) — `abs` would overflow on
    * Long.MinValue). Same range as [[h28]], so the MinHash family
    * arithmetic keeps its overflow headroom; no MD5, codegen'd
    * built-in, no cross-engine oracle twin — production only. */
  def fast28(c: Column): Column =
    xxhash64(c).bitwiseAND(lit((1L << 28) - 1))

  /** The j-th MinHash-family hash of an h28 value. */
  def minhashJ(x: Column, j: Int): Column =
    (x * lit(A(j)) + lit(B(j))) % lit(P)

  /** Behavioral fingerprint of a hash family: the family evaluated on
    * two fixed probe strings. Two `Column => Column` functions that
    * compute the same hash fingerprint identically; [[h28]] vs
    * [[fast28]] (or any custom family) diverge — which is exactly the
    * mismatch [[graft.engine.TextOps.dedupIncremental]] must reject
    * (different families never band-collide → silent no-op dedup).
    *
    * Evaluated through a one-row local DataFrame (the functions-API
    * Column tree may contain unresolved functions, so a driver-side
    * `Expression.eval` is not available) and memoized per expression
    * tree, so each family pays the one-row job once per JVM. */
  def familyFingerprint(s: SparkSession, hash: Column => Column): String = {
    val probes = Seq("graft:family:probe:0", "graft:family:probe:1")
    // identical families build identical trees — a sound memo key
    // (same tree ⇒ same deterministic eval); distinct-but-equivalent
    // formulations just pay the tiny job once each
    val key = probes.map(p => hash(lit(p)).toString).mkString("|")
    familyFpCache.computeIfAbsent(key, _ => {
      val row = s.range(1)
        .select(probes.zipWithIndex.map { case (p, i) =>
          hash(lit(p)).cast("string").as(s"f$i") }: _*)
        .head()
      probes.indices.map(row.getString).mkString(",")
    })
  }

  private val familyFpCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** DuckDB SQL computing the same h28 value for expression `e`
    * (DuckDB has no hex→int conv; expand digit arithmetic). */
  def duckH28(e: String): String = {
    val terms = (1 to 7).map { i =>
      val w = 1L << (4 * (7 - i)) // 16^(7-i)
      s"(strpos('0123456789abcdef', substr(md5($e), $i, 1))-1)*$w"
    }
    s"(${terms.mkString(" + ")})"
  }

  /** DuckDB SQL for minhashJ over an h28 SQL expression. */
  def duckMinhashJ(x: String, j: Int): String =
    s"(${A(j)}*$x + ${B(j)}) % $P"
}
