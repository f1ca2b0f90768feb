package graft

import graft.ops.Bucketing
import graft.schema.Tables
import graft.sources.JdbcSource
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  test("custom expressions are SQL-callable via SparkSessionExtensions") {
    val r = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                jaccard_sim(array('a','b'), array('b','c')) AS j,
                sim_hash64('spark scan merge') AS sh,
                shingles('the fast key order', 2, true) AS sg,
                min_hash_sig(array('ab','cd'), 4, 42) AS mh""")
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0 / 3.0) < 1e-15)
    assert(r.getSeq[String](3) == Seq("the fast", "fast key", "key order"))
    assert(r.getSeq[Long](4).length == 4)
    // SQL and Column API produce identical values
    import spark.implicits._
    val viaCol = Seq("spark scan merge").toDF("t")
      .select(graft.functions.VectorFunctions.simHash64(col("t")))
      .collect()(0).getLong(0)
    assert(r.getLong(2) == viaCol)
  }
}

class BucketingSpec extends SparkSpec {
  test("same-bucketed tables join with no shuffle exchange") {
    val dir = sf()
    Bucketing.writeBucketed(
      spark.read.parquet(s"$dir/orders.parquet"), "b_orders",
      "o_orderkey", 8)
    Bucketing.writeBucketed(
      spark.read.parquet(s"$dir/lineitem.parquet")
        .withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem",
      "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      // result parity with the plain join
      val want = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      prevThreshold)
  }
}

/** Real JDBC extraction against embedded Derby: proves S1/S2 semantics
  * (watermark >= filter reaches the database, projection to declared
  * columns) with an actual DBMS rather than SQL-string assertions. */
class JdbcDerbySpec extends SparkSpec {
  test("JDBC incremental read: watermark pushdown + projection") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val spec = Tables.registry("retail_plans")
    val cols = spec.columns.map(c => s"\"$c\" VARCHAR(64)").mkString(", ")
    val st = conn.createStatement()
    try st.execute(s"DROP TABLE retail_plans") catch { case _: Throwable => }
    st.execute(s"CREATE TABLE retail_plans ($cols)")
    def insert(id: String, updatedAt: String): Unit = {
      val vals = spec.columns.map {
        case "id" => id
        case "updated_at" | "created_at" => updatedAt
        case _ => "x"
      }.map(v => s"'$v'").mkString(", ")
      st.execute(s"INSERT INTO retail_plans VALUES ($vals)")
    }
    insert("1", "2024-01-01 00:00:00") // below watermark
    insert("2", "2024-02-01 00:00:00") // exactly on boundary (>=)
    insert("3", "2024-02-02 12:00:00") // above
    val df = JdbcSource.readFromUrl(spark, spec, url, "", "",
      watermark = "2024-02-01 00:00:00")
    assert(df.columns.toSeq == spec.columns) // projection to declared set
    val ids = df.select("id").collect().map(_.getString(0)).toSet
    assert(ids == Set("2", "3")) // >= boundary semantics
    // the predicate is pushed into the JDBC scan, not applied in Spark
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.replaceAll("\\s", "").contains("updated_at"))
    conn.close()
  }

  test("parallel extract: 4 range partitions, same rows as serial") {
    // Regression for the upperBound format bug: Spark parses timestamp
    // partition bounds with Timestamp.valueOf, which rejects ISO-8601's
    // 'T' separator — the default (driver-now) bound must render as
    // 'yyyy-MM-dd HH:mm:ss'. Partition column must be a real TIMESTAMP.
    val url = "jdbc:derby:memory:graftpar;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val spec = Tables.registry("retail_plans")
    val cols = spec.columns.map {
      case "updated_at" => "\"updated_at\" TIMESTAMP"
      case c => s"\"$c\" VARCHAR(64)"
    }.mkString(", ")
    val st = conn.createStatement()
    try st.execute("DROP TABLE retail_plans") catch { case _: Throwable => }
    st.execute(s"CREATE TABLE retail_plans ($cols)")
    val ins = conn.prepareStatement(
      "INSERT INTO retail_plans VALUES (" +
        spec.columns.map(_ => "?").mkString(", ") + ")")
    for (i <- 1 to 40) {
      spec.columns.zipWithIndex.foreach {
        case ("updated_at", j) => ins.setTimestamp(j + 1,
          java.sql.Timestamp.valueOf(f"2024-02-${i % 20 + 1}%02d 06:30:00"))
        case ("id", j) => ins.setString(j + 1, i.toString)
        case (_, j) => ins.setString(j + 1, "x")
      }
      ins.executeUpdate()
    }
    val wm = "2024-02-03 00:00:00"
    val serial = JdbcSource.readFromUrl(spark, spec, url, "", "", wm)
    // default upperBound (driver now) — the branch that used to throw
    val par = JdbcSource.readFromUrl(spark, spec, url, "", "", wm,
      numPartitions = 4)
    assert(par.rdd.getNumPartitions == 4)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("id").collect().map(_.getString(0)).toSet
    assert(key(par) == key(serial) && key(par).size == 36)
    // pinned upperBound (deterministic strides) — identical row set too
    val pinned = JdbcSource.readFromUrl(spark, spec, url, "", "", wm,
      numPartitions = 4, upperBound = Some("2024-02-10 00:00:00"))
    assert(pinned.rdd.getNumPartitions == 4 && key(pinned) == key(serial))
    conn.close()
  }
}

/** The custom whole-operator plan (LogicalPlan + Strategy + Exec via
  * SparkSessionExtensions) must plan through SimilarityTopKExec and
  * produce exactly the composed implementation's results. */
class CustomPlanSpec extends SparkSpec {
  test("SimilarityTopK plans to SimilarityTopKExec and matches bruteForceTopK") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val planned = graft.ext.Similarity.topKPlanned(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 4)
    val execNodes = planned.queryExecution.executedPlan.collect {
      case e: graft.plans.SimilarityTopKExec => e
    }
    assert(execNodes.nonEmpty, "strategy did not plan SimilarityTopKExec")
    val physical = planned.queryExecution.executedPlan.toString
    assert(!physical.contains("Window"), "custom plan must not shuffle/rank")
    val composed = graft.ext.Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", 4)
    val g = planned.collect().map(_.toSeq).toSet
    val w = composed.collect().map(_.toSeq).toSet
    assert(g == w && g.size == 20)
  }

  test("wide query set: every corpus vector as a query (tree-merged partials)") {
    // exercises the executor-side tree merge: the driver must only see
    // one |queries|*k partial, never #partitions of them — and results
    // must still equal the composed window plan at full width
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .repartition(16) // force many partials into the tree merge
    val k = 3
    val planned = graft.ext.Similarity.topKPlanned(
      emb, emb, "vec_id", "embedding", k)
    val composed = graft.ext.Similarity.bruteForceTopK(
      emb, emb, "vec_id", "embedding", k)
    val g = planned.collect().map(_.toSeq).toSet
    val w = composed.collect().map(_.toSeq).toSet
    val nQ = emb.count()
    assert(g == w && g.size == nQ * k)
  }
}

/** The injected optimizer rule must push q_id predicates through the
  * custom operator into the queries-side scan, leaving rank predicates
  * above, without changing results. */
class CustomRuleSpec extends SparkSpec {
  test("q_id filter pushes through SimilarityTopK to the scan") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val filtered = graft.ext.Similarity.topKPlanned(emb, emb,
      "vec_id", "embedding", 3)
      .filter(col("q_id") < 3 && col("rank") === 1)
    val physical = filtered.queryExecution.executedPlan.toString
    // pushed: the queries-side parquet scan carries the vec_id predicate
    assert(physical.contains("LessThan(vec_id,3)"), physical.take(800))
    // results equal pre-filtering the query set
    val want = graft.ext.Similarity.topKPlanned(
      emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", 3)
      .filter(col("rank") === 1)
      .collect().map(_.toSeq).toSet
    val got = filtered.collect().map(_.toSeq).toSet
    assert(got == want && got.size == 3)
  }
}
