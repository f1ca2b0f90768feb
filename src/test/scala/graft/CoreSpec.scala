package graft

import graft.ops.{Normalize, PartitionKeys, SemiJoins, Upsert}
import graft.schema.{TableSpec, Tables}
import graft.state.WatermarkStore
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class WatermarkStoreSpec extends org.scalatest.funsuite.AnyFunSuite {
  private val clock = () => java.time.LocalDateTime.of(2026, 8, 12, 10, 30, 5)

  test("default watermark is yesterday-midnight (gluejob.py:78-87)") {
    val store = new WatermarkStore(
      java.nio.file.Paths.get(sys.props("user.dir"), "target",
        "wm-none.json"), clock)
    assert(store.get("retail_plans") == "2026-08-11 00:00:00")
  }

  test("advance is in-memory until commit; commit round-trips") {
    val p = java.nio.file.Files.createTempFile(
      java.nio.file.Paths.get(sys.props("user.dir"), "target"),
      "wm", ".json")
    java.nio.file.Files.delete(p)
    val store = new WatermarkStore(p, clock)
    store.advance("retail_plans", "2026-08-12 04:00:00")
    val reread = new WatermarkStore(p, clock)
    assert(reread.get("retail_plans") == "2026-08-11 00:00:00")
    store.commit()
    val after = new WatermarkStore(p, clock)
    assert(after.get("retail_plans") == "2026-08-12 04:00:00")
  }

  test("flat json codec round-trips escapes") {
    val m = Map("a\"b" -> "v\\1", "t" -> "2026-01-01 00:00:00")
    assert(WatermarkStore.parseFlatJson(WatermarkStore.renderFlatJson(m)) == m)
  }
}

class RegistrySpec extends org.scalatest.funsuite.AnyFunSuite {
  test("9 tables declared, 8 active (checkout_orders disabled)") {
    assert(Tables.all.size == 9)
    assert(Tables.active.size == 8)
    assert(!Tables.registry("checkout_orders").enabled)
  }
  test("per-table special cases (gluejob.py:174,191,227,235,30-42)") {
    val co = Tables.registry("checkout_orders")
    assert(co.idCol == "ID_Order" && co.dateCol == "DT_CreatedAt"
      && co.csvSep == "," && co.source == graft.schema.SqlServer)
    assert(Tables.registry("retail_order_migrations").boolCols ==
      Seq("pre_paid", "main"))
    assert(Tables.registry("retail_subscription_readjustments").boolCols ==
      Seq("suspended"))
    assert(Tables.registry("retail_orders").columns.size == 12)
    assert(Tables.registry("retail_subscriptions").columns.size == 20)
  }
}

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("bool canon truth table (gluejob.py:16-28)") {
    val in = Seq("True", "False", "t", "f", "true", "false", "junk", null)
      .toDF("v")
    val out = in.select(Normalize.boolCanon(col("v")).as("v"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("true", "false", "true", "false", "true",
      "false", "junk", null))
  }

  test("bool canon is idempotent and total") {
    val in = Seq("true", "false", "x", "").toDF("v")
    val once = in.select(Normalize.boolCanon(col("v")).as("v"))
    val twice = once.select(Normalize.boolCanon(col("v")).as("v"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("toBronze: all-string schema, micro text on date col, bool canon") {
    val spec = TableSpec("x", Seq("id", "flag", "created_at"),
      "id", "created_at", boolCols = Seq("flag"))
    val src = Seq((1L, "t", java.sql.Timestamp.valueOf("2024-03-05 01:02:03")))
      .toDF("id", "flag", "created_at")
    val out = Normalize.toBronze(src, spec)
    assert(out.schema.fields.forall(_.dataType == StringType))
    val r = out.collect()(0)
    assert(r.getString(0) == "1" && r.getString(1) == "true"
      && r.getString(2) == "2024-03-05 01:02:03.000000")
  }

  test("partition keys: company constant, unpadded year/month ints") {
    val df = Seq("2024-03-05 01:02:03.000000").toDF("created_at")
    val out = PartitionKeys.withCompanyYearMonth(df, "created_at")
    val r = out.select("company", "year", "month").collect()(0)
    assert(r == Row("Locaweb", 2024, 3))
  }
}

class SemiJoinsSpec extends SparkSpec {
  test("3-hop chain equals nested IN-subqueries") {
    val dir = sf()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderdate") >= to_timestamp(lit("1998-01-01")))
    val c = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
    val got = SemiJoins.semiJoinChain(li,
      Seq(("l_orderkey", o, "o_orderkey"), ("o_custkey", c, "c_custkey")))
      .count()
    Seq("lineitem", "orders", "customer").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    val want = spark.sql(
      """SELECT count(*) FROM lineitem WHERE l_orderkey IN (
           SELECT o_orderkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_custkey IN (
             SELECT c_custkey FROM customer
             WHERE c_mktsegment = 'BUILDING'))""").collect()(0).getLong(0)
    assert(got == want && got > 0)
  }
}

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (String, String, String)*) =
    rows.toDF("id", "payload", "updated_at")

  test("merge: new beats old on id; within-batch ties broken by updated_at desc") {
    val newDf = df(("1", "new1", "2024-01-02 00:00:00"),
      ("2", "new2", "2024-01-02 00:00:00"))
    val oldDf = df(("1", "old1", "2024-01-01 00:00:00"),
      ("3", "old3", "2024-01-01 00:00:00"))
    val out = Upsert.merge(newDf, oldDf, "id", "updated_at")
      .orderBy("id").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("1", "new1"), ("2", "new2"), ("3", "old3")))
  }

  test("upsertPartitioned: idempotent re-ingest, only touched partitions") {
    val root = tmpDir("upsert")
    val path = s"$root/t"
    def batch(rows: (String, String, String)*) = {
      val b = rows.toDF("id", "payload", "created_at")
        .withColumn("updated_at", col("created_at"))
      PartitionKeys.withCompanyYearMonth(b, "created_at")
    }
    val b1 = batch(("1", "a", "2024-01-10 00:00:00"),
      ("2", "b", "2024-02-10 00:00:00"))
    Upsert.upsertPartitioned(spark, b1, path, "id", "updated_at")
    // second batch updates id=1 (jan partition) and adds id=3 (mar)
    val b2 = batch(("1", "a2", "2024-01-11 00:00:00"),
      ("3", "c", "2024-03-10 00:00:00"))
    Upsert.upsertPartitioned(spark, b2, path, "id", "updated_at")
    val out = spark.read.parquet(path)
      .select("id", "payload").orderBy("id")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("1", "a2"), ("2", "b"), ("3", "c")))
    // idempotence: replay b2 — no change
    Upsert.upsertPartitioned(spark, b2, path, "id", "updated_at")
    assert(spark.read.parquet(path).count() == 3)
    // partition layout is hive company/year/month
    assert(new java.io.File(s"$root/t/company=Locaweb/year=2024/month=1")
      .exists())
  }
}
