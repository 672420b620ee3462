package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark's DataFrame API lacks (pandas-on-Spark
  * has `merge_asof`; plain SQL needs an inequality join): for each left
  * row, pick the latest right row with `rightTime <= leftTime` within the
  * same key.
  *
  * Implementation is the scalable union+window formulation, NOT an
  * inequality join: tag both sides, union, one shuffle on the key, sort
  * within the key by (time, tag, tieBreak), carry the last non-null
  * right payload forward, keep the left rows. Cost is one shuffle + one
  * sort — O((|L|+|R|)·log) — versus the O(|L|·|R|) per-key blowup of the
  * naive inequality join, which is what makes it usable at 100 TB.
  */
object AsOfJoin {

  // Time columns must reach the comparison losslessly AND comparably:
  // `cast("long")` on a TIMESTAMP truncates to whole SECONDS (a right
  // row 300ms in the left row's future would match it), DATE→BIGINT is
  // forbidden outright in Spark 4 (DATATYPE_MISMATCH), and on a string
  // the cast yields null — so timestamps convert via unix_micros, dates
  // via unix_date (days), and anything non-numeric is refused. The two
  // sides normalize to DIFFERENT units per family (micros / days / raw
  // epoch), so they must share a family: a timestamp left against a
  // long right would silently compare micros to arbitrary ticks and
  // produce wrong matches. Shared with the streaming twin
  // (StreamOps.asofStreamAgainstStatic).
  private[graft] def timeFamily(df: DataFrame, c: String): String = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case TimestampType => "timestamp (micros)"
      case DateType      => "date (days)"
      case LongType | IntegerType | ShortType | ByteType => "integral epoch"
      case t => throw new IllegalArgumentException(
        s"as-of time column $c is ${t.sql}; pass an integral epoch, " +
          "a date, or a timestamp (strings/doubles would cast lossily)")
    }
  }

  private[graft] def requireSharedTimeFamily(
      left: DataFrame, leftTime: String,
      right: DataFrame, rightTime: String): Unit =
    require(timeFamily(left, leftTime) == timeFamily(right, rightTime),
      s"as-of time columns must share a type family: $leftTime is " +
        s"${timeFamily(left, leftTime)}, $rightTime is " +
        s"${timeFamily(right, rightTime)} (cast one side explicitly)")

  private[graft] def timeAsLong(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case DateType      => unix_date(col(c)).cast("long")
      case _             => col(c).cast("long")
    }
  }

  /** @param tieBreak right columns ordering equal-time right rows; the
    *                 *last* in ascending order wins (max tie-break). */
  def asofLatest(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String], tieBreak: Seq[String]): DataFrame = {

    require(left.schema(leftKey).dataType == right.schema(rightKey).dataType,
      s"as-of join keys must share a type: $leftKey is " +
        s"${left.schema(leftKey).dataType.sql}, $rightKey is " +
        s"${right.schema(rightKey).dataType.sql} (cast one side explicitly)")
    requireSharedTimeFamily(left, leftTime, right, rightTime)
    val leftCols = left.columns.toSeq
    // keys keep their native type (an earlier cast("long") nulled string
    // keys, collapsing every row into one window partition and matching
    // across keys). Null-key right rows can never match under SQL join
    // semantics, so they are dropped — and so are null-TIME right rows:
    // null __t sorts first ascending, so such a row would otherwise be
    // carried as the "latest" match for every left row before the first
    // real right row, where SQL `rightTime <= leftTime` says no match.
    // Null-key/time left rows survive with a null match.
    val rightSide = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"),
        timeAsLong(right, rightTime).as("__t"),
        lit(0).as("__tag"),
        struct(rightCols.map(col): _*).as("__rpay"))
    val leftSide0 = left.select(
      col(leftKey).as("__k"),
      timeAsLong(left, leftTime).as("__t"),
      lit(1).as("__tag"),
      struct(leftCols.map(col): _*).as("__lpay"))
    val unioned = rightSide
      .withColumn("__lpay", lit(null).cast(leftSide0.schema("__lpay").dataType))
      .unionByName(leftSide0
        .withColumn("__rpay", lit(null).cast(rightSide.schema("__rpay").dataType)))

    // Right rows sort before left rows at equal time (tag 0 < 1), so
    // "<=" semantics come out of the carry; tie-break columns order
    // equal-time right rows so `last` picks the maximum.
    val orderCols: Seq[Column] =
      col("__t") +: col("__tag") +: tieBreak.map(c => col("__rpay").getField(c))
    val w = Window.partitionBy(col("__k")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      // a null-TIME left row matches nothing (SQL `rightTime <= NULL`
      // is never true) — explicitly, not via null sort placement: the
      // engine's portable-ordering policy (Registry0.portableOrder)
      // rewrites ascending NULLS FIRST to NULLS LAST, which would
      // otherwise sort null-time left rows after every right row and
      // hand them the globally-latest match
      .withColumn("__match", when(col("__t").isNotNull,
        last(col("__rpay"), ignoreNulls = true).over(w)))
      .filter(col("__tag") === 1)
      .select(leftCols.map(c => col("__lpay").getField(c).as(c)) ++
        rightCols.map(c => col("__match").getField(c).as(c)): _*)
  }
}
