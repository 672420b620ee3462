package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.engine.PortableMath

/** The exact-isqrt ladder: Spark's estimate+adjust must equal the
  * engine-independent BigInt reference on every adversarial input —
  * INCLUDING values past int64, where the float seed may be off (that
  * is the divergence class the ladder exists to kill). The DuckDB side
  * of the same fragment is probed by scripts/isqrt_probe.py against
  * python's math.isqrt (result recorded in SCALE.md).
  */
class PortableMathSpec extends SparkSpec {

  private def sparkIsqrt(ts: Seq[BigInt]): Seq[(BigInt, BigInt)] = {
    val schema = StructType(Seq(
      StructField("t", DecimalType(38, 0), nullable = false)))
    val rows = ts.map(t => Row(new java.math.BigDecimal(t.bigInteger)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
      .withColumn("r0",
        expr(PortableMath.isqrtEstimate("t", "DECIMAL(38,0)")))
      .withColumn("r", expr(PortableMath.isqrtAdjust("r0", "t")))
    df.select(col("t"), col("r")).collect().toSeq
      .map(r => (BigInt(r.getDecimal(0).toBigInteger),
        BigInt(r.getDecimal(1).toBigInteger)))
  }

  test("isqrt ladder is exact on boundary + >int64 + near-2^106 inputs") {
    // roots up to ~2^50 keep k² inside the 2^106 exactness envelope
    val squares = Seq(BigInt(3037000499L), // floor(sqrt(Long.Max))
      BigInt(2).pow(32), BigInt(2).pow(40) + 12345,
      BigInt("1234567890123456"), BigInt(10).pow(15) + 7)
    val ts = Seq(BigInt(0), BigInt(1), BigInt(2), BigInt(3), BigInt(4),
      BigInt(Long.MaxValue), BigInt(Long.MaxValue) + 1, // int64 edge
      BigInt(2).pow(64), BigInt(2).pow(80) + 17,
      BigInt(10).pow(22), BigInt(10).pow(25),
      PortableMath.IsqrtExactBound - 1) ++
      squares.flatMap(k => Seq(k * k - 1, k * k, k * k + 1))
    for ((t, got) <- sparkIsqrt(ts)) {
      val want = PortableMath.isqrtRef(t)
      assert(got == want, s"isqrt($t): got $got want $want")
      assert(want * want <= t && (want + 1) * (want + 1) > t,
        s"reference self-check failed at $t")
    }
  }

  test("isqrt ladder is exact on randomized inputs across magnitudes") {
    val rnd = new scala.util.Random(20260815L)
    val ts = (1 to 400).map { i =>
      val bits = 1 + rnd.nextInt(105) // full exactness envelope
      BigInt(bits, rnd)
    }
    for ((t, got) <- sparkIsqrt(ts)) {
      assert(got == PortableMath.isqrtRef(t), s"isqrt($t) mismatch")
    }
  }

  test("isqrtRef reference agrees with exact squares") {
    for (k <- Seq(BigInt(0), BigInt(1), BigInt(7), BigInt(10).pow(12))) {
      assert(PortableMath.isqrtRef(k * k) == k)
      if (k > 0) assert(PortableMath.isqrtRef(k * k - 1) == k - 1)
    }
  }
}
