package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.api.FlowEngine
import graft.engine.{ProgressReporter, Types}

class FlowEngineSpec extends SparkSpec {
  import spark.implicits._

  private def freshWarehouse(): (FlowEngine, String) = {
    val dir = Files.createTempDirectory("graft_wh").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v").write.parquet(s"$dir/items.parquet")
    (new FlowEngine(spark, dir), dir)
  }

  test("connect registers warehouse tables; getData runs arbitrary SQL over them") {
    val (eng, _) = freshWarehouse()
    assert(eng.connect().get == Seq("items"))
    val df = eng.getData("SELECT k, v FROM items WHERE v >= 20 ORDER BY k").get
    assert(df.as[(Long, Double)].collect().toSeq == Seq((2L, 20.0), (3L, 30.0)))
    eng.disconnect()
  }

  test("getData returns None and logs on bad SQL (sql.py:166-171 contract)") {
    val (eng, _) = freshWarehouse()
    eng.connect()
    assert(eng.getData("SELECT nope FROM missing_table").isEmpty)
    eng.disconnect()
  }

  test("getData applies coercion + decimal(38,20) normalization") {
    val (eng, _) = freshWarehouse()
    eng.connect()
    val df = eng.getData("SELECT k, v FROM items",
      Types.CoercionSpec(decimalColumns = Seq("v"))).get
    assert(df.schema("v").dataType == Types.NormalizedDecimal)
    eng.disconnect()
  }

  test("insertData appends; updateData merges by key; conditional delete filters") {
    val (eng, dir) = freshWarehouse()
    eng.insertData("items", Seq((4L, "d", 40.0)).toDF("k", "name", "v"))
    assert(spark.read.parquet(s"$dir/items.parquet").count() == 4)

    val schema = spark.read.parquet(s"$dir/items.parquet")
      .select("k", "name").schema
    eng.updateData("items",
      Seq(new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array(2L, "B!"), schema): Row), Seq("k"))
    val afterUpd = spark.read.parquet(s"$dir/items.parquet")
    assert(afterUpd.filter($"k" === 2).select("name").as[String].head() == "B!")
    assert(afterUpd.count() == 4)

    eng.deleteDataWithConditions("items", "v >= 30.0")
    val left = spark.read.parquet(s"$dir/items.parquet")
    assert(left.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L))

    eng.truncateTable("items")
    val empty = spark.read.parquet(s"$dir/items.parquet")
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("k", "name", "v"))
  }

  test("getData sees mutations through registered views (no stale file index)") {
    val (eng, _) = freshWarehouse()
    eng.connect()
    def cnt(): Long =
      eng.getData("SELECT count(*) AS c FROM items").get.head().getLong(0)
    assert(cnt() == 3L)
    // append: a stale InMemoryFileIndex would silently still report 3
    eng.insertData("items", Seq((4L, "d", 40.0)).toDF("k", "name", "v"))
    assert(cnt() == 4L, "view must see appended files")
    // rewrite: a stale index would crash with FILE_NOT_EXIST
    eng.deleteDataWithConditions("items", "k = 4")
    assert(cnt() == 3L, "view must survive the in-place rewrite")
    eng.truncateTable("items")
    assert(cnt() == 0L, "view must see the truncated table")
    eng.disconnect()
  }

  test("updateFromTable merges a source frame (sql.py:253-289)") {
    val (eng, dir) = freshWarehouse()
    eng.updateFromTable("items",
      Seq((1L, 111.0), (3L, 333.0)).toDF("k", "v"), Seq("k"))
    val out = spark.read.parquet(s"$dir/items.parquet")
      .orderBy("k").select("v").as[Double].collect().toSeq
    assert(out == Seq(111.0, 20.0, 333.0))
  }

  test("progress reporter observes rows and bytes read (sql.py:146-156)") {
    var calls = 0L
    val (_, rows, bytes) = ProgressReporter.withProgress(spark) { (r, b) =>
      calls += 1
    } {
      spark.read.parquet(s"$sf/lineitem.parquet").count()
    }
    assert(rows >= 6000 && bytes > 0 && calls > 0)
  }
}
