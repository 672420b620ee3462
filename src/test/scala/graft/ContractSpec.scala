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

  /** The q_pack_seqs lesson (round 3's one red row): a final ORDER BY
    * whose keys can tie across rows that differ elsewhere lets the two
    * engines emit different row orders — the driver hashes rows in
    * emitted order, so that's a hash mismatch waiting for the right
    * data. The contract: for every declared query, rows that tie on the
    * outermost Sort's keys must be IDENTICAL across all output columns
    * (distinct full rows == distinct sort-key tuples). Run at sf0.01,
    * the driver's verify SF, so ties invisible at sf0.001 still trip. */
  test("every declared query's final sort is a total order at sf0.01") {
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort,
      SubqueryAlias}
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.functions.col

    // Right(sort) = validate keys; Left(true) = single-row global
    // aggregate, order-deterministic by construction; Left(false) = bug.
    @annotation.tailrec
    def outerSort(p: LogicalPlan): Either[Boolean, Sort] = p match {
      case s: Sort if s.global                   => Right(s)
      case a: Aggregate if a.groupingExpressions.isEmpty => Left(true)
      case GlobalLimit(_, c)                     => outerSort(c)
      case LocalLimit(_, c)                      => outerSort(c)
      case SubqueryAlias(_, c)                   => outerSort(c)
      case Project(_, c)                         => outerSort(c)
      case _                                     => Left(false)
    }

    val d01 = "/root/testdata/sf0.01"
    val bad = Registry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, d01)
      outerSort(df.queryExecution.analyzed) match {
        case Left(true)  => None
        case Left(false) => Some(s"$name: no outermost global Sort")
        case Right(s) =>
          val keyNames = s.order.map(_.child).map {
            case a: AttributeReference => a.name
            case Alias(_, n)           => n
            case other                 => other.sql
          }
          val out = df.columns.toSet
          if (keyNames.forall(out.contains)) {
            // distinct sort-key tuples must equal distinct full rows —
            // key-tied rows differing in any other column are the bug
            val groups = df.select(keyNames.map(col): _*).distinct().count()
            val rows   = df.distinct().count()
            if (groups != rows)
              Some(s"$name: sort keys ${keyNames.mkString(",")} tie across " +
                s"non-identical rows ($groups key tuples, $rows distinct rows)")
            else None
          } else
            // sort key pruned from the output: order can't be validated
            // against emitted columns — flag it (keys must be output cols)
            Some(s"$name: sort keys ${keyNames.mkString(",")} not all in " +
              s"output ${df.columns.mkString(",")}")
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  /** The q_pack_seqs/q_event_trans round-4 lesson: Spark's ASC default
    * is NULLS FIRST, DuckDB's is NULLS LAST, so ANY ascending sort —
    * final ORDER BY or window ORDER BY — whose key goes null on some
    * future driver-generated dataset diverges the emitted row order (or
    * the window's cumulative/lead values) between the engines.
    * Registry0.portableOrder rewrites every registered plan to NULLS
    * LAST; this contract pins the rewrite wired for every query,
    * including SortOrders inside subquery expressions (which
    * transformAllExpressions does not reach — any hit here means the
    * query needs a local explicit ordering). */
  test("no declared query carries an ASC NULLS FIRST ordering anywhere") {
    import org.apache.spark.sql.catalyst.expressions.{
      Ascending, NullsFirst, SortOrder}
    val bad = Registry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.analyzed
      val hits = plan.collectWithSubqueries {
        case p => p.expressions.flatMap(_.collect {
          case so @ SortOrder(_, Ascending, NullsFirst, _) => so.sql
        })
      }.flatten
      if (hits.isEmpty) None
      else Some(s"$name: ASC NULLS FIRST ordering(s): ${hits.mkString("; ")}")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
