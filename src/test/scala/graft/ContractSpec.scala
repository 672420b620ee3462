package graft

import org.apache.spark.sql.types.DecimalType

/** Output-type contract for every declared query (the round-1 lesson):
  * DECIMAL-typed output columns canonicalize engine-specifically under
  * the driver's hash, so decimal arithmetic must stay internal and the
  * final projection must emit only BIGINT/DOUBLE/STRING/DATE/BOOLEAN.
  * Only schemas are asserted, but CONSTRUCTING some queries runs real
  * work (the similarity queries count the corpus for the adaptive bit
  * count; the dedup queries materialize their shared stages), so this
  * spec also doubles as a smoke test of every query's plan-build path. */
class ContractSpec extends SparkSpec {

  test("no declared query emits a DECIMAL-typed output column") {
    Registry.queries.foreach { case (name, fn) =>
      val bad = fn(spark, sf).schema.fields
        .filter(_.dataType.isInstanceOf[DecimalType]).map(_.name)
      assert(bad.isEmpty,
        s"$name emits DECIMAL output column(s): ${bad.mkString(", ")}")
    }
  }

  test("every declared query has oracle SQL and vice versa") {
    val q = Registry.queries.keySet
    val o = Registry.oracleSql.keySet
    assert((q diff o).isEmpty, s"queries without oracle: ${q diff o}")
    assert((o diff q).isEmpty, s"oracles without query: ${o diff q}")
  }
}
