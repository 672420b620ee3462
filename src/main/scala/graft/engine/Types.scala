package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type rules of the engine.
  *
  * Mirrors the reference's two client-side type behaviors (flowbyte
  * `sql.py`):
  *  - per-column dtype coercion requested by the caller
  *    (`sql.py:88,122-130`; we implement the documented *intent* — the
  *    reference loop has swapped variables, see SURVEY.md §1.2);
  *  - normalization of every decimal column to decimal(38,20)
  *    (`sql.py:104-105,132-141`), the one hard type rule in the reference.
  */
object Types {

  /** The reference's fixed decimal target: precision 38, scale 20
    * (`sql.py:104-105`). Spark's max precision is also 38 — exact match. */
  val NormalizedDecimal: DecimalType = DecimalType(38, 20)

  /** Exact "money" type for 2-decimal monetary doubles. Small precision on
    * purpose: products of two Money values stay well inside precision 38,
    * so decimal arithmetic is exact (never silently rounded) in both Spark
    * and any ANSI engine. */
  val Money: DecimalType = DecimalType(10, 2)

  /** Cast a 2-decimal double column to the exact Money decimal.
    *
    * try_cast, not cast: Spark 4 runs ANSI mode, where a NaN / ±Inf /
    * beyond-(10,2) payload makes a strict cast THROW mid-query. The
    * engine's money policy is quarantine-not-crash — hostile payloads
    * become NULL (excluded from sums like any absent measure) exactly as
    * the oracle's NaN-guarded try_cast does (Registry0.portableCasts);
    * the fuzz `money` class locks the parity. */
  def money(c: Column): Column = c.try_cast(Money)

  /** Final cast for aggregate outputs.
    *
    * Decimal arithmetic stays INTERNAL (exact, order-free sums); the
    * declared query OUTPUT is always DOUBLE. Spark's decimal→double is
    * correctly rounded (BigDecimal.doubleValue). DuckDB's direct
    * DECIMAL→DOUBLE is NOT once the unscaled units exceed 2⁵³ — it
    * double-rounds (int→double then the scale divide; measured in the
    * r9 sf1 sweep when q_agg_group's sum_charge crossed the line) — so
    * every oracle mirror routes the projection through VARCHAR
    * (exact digits → correctly-rounded strtod; the automatic
    * Registry0.portableDoubleOut rewrite), making both engines a
    * SINGLE correctly-rounded conversion of the same exact decimal.
    * DECIMAL *output* columns would hash differently under the
    * driver's canonicalization (the round-1 lesson: 16 value-exact
    * queries were hash-red purely from DECIMAL(38,_) output types),
    * hence DOUBLE outputs, exactly projected. */
  def outD(c: Column): Column = c.cast(DoubleType)

  /** Caller-requested dtype coercion, the documented intent of
    * `sql.py:122-130`: cast each named column to the named type.
    * `category` has no Spark runtime analog (dictionary encoding is a
    * storage detail under Tungsten) — mapped to StringType, semantics
    * preserved (SURVEY.md §1.3).
    */
  final case class CoercionSpec(
      categoryColumns: Seq[String] = Nil,
      boolColumns: Seq[String] = Nil,
      floatColumns: Seq[String] = Nil,
      decimalColumns: Seq[String] = Nil)

  def coerce(df: DataFrame, spec: CoercionSpec): DataFrame = {
    val target: Map[String, DataType] =
      spec.categoryColumns.map(_ -> (StringType: DataType)).toMap ++
        spec.boolColumns.map(_ -> (BooleanType: DataType)) ++
        spec.floatColumns.map(_ -> (DoubleType: DataType)) ++
        spec.decimalColumns.map(_ -> (Money: DataType))
    // Single Project node; Catalyst folds it into the scan-adjacent
    // projection, so coercion costs nothing extra at scale.
    df.select(df.columns.toIndexedSeq.map { name =>
      target.get(name) match {
        // decimal coercion follows the money quarantine policy (see
        // [[money]]): hostile payloads → NULL, not an ANSI throw
        case Some(t: DecimalType) => col(name).try_cast(t).as(name)
        case Some(t) => col(name).cast(t).as(name)
        case None    => col(name)
      }
    }: _*)
  }

  /** The decimal(38,20) normalization pass (`sql.py:132-141`): every
    * DecimalType column — and only decimal columns, matching the
    * reference, which leaves floats alone — is cast to (38,20).
    *
    * Overflow fails LOUDLY: (38,20) holds 18 integer digits, and with
    * ANSI off Spark's cast silently nulls a value that doesn't fit —
    * data corruption the reference's Python decimal path would raise
    * on. The guard costs one null-check per decimal cell, folded into
    * the same scan-adjacent projection. */
  def normalizeDecimals(df: DataFrame): DataFrame =
    df.select(df.schema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        case _: DecimalType =>
          val c = col(f.name).cast(NormalizedDecimal)
          when(col(f.name).isNotNull && c.isNull,
            raise_error(concat(
              lit(s"decimal overflow normalizing column ${f.name} to " +
                "(38,20), value "),
              col(f.name).cast("string"))).cast(NormalizedDecimal))
            .otherwise(c).as(f.name)
        case _ => col(f.name)
      }
    }: _*)
}
