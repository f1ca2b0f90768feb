package graft

import graft.ext.Dedup
import graft.ops.{Normalize, Upsert}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.2): bool-canon totality and
  * idempotence, upsert precedence/idempotence, jaccard bounds and
  * fingerprint determinism — driven through the engine, not replicas. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic ScalaCheck sampling (no scalatest bridge in deps). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val anyString: Gen[String] =
    Gen.oneOf(Gen.oneOf("True", "False", "t", "f", "true", "false"),
      Gen.alphaNumStr, Gen.const(""), Gen.const("junk"))

  test("bool canon: total (never null on non-null), idempotent, canonical") {
    samples(Gen.listOfN(20, anyString), 8).filter(_.nonEmpty).foreach { vs =>
      {
        val out = vs.toDF("v")
          .select(Normalize.boolCanon(col("v")).as("c1"))
          .select(col("c1"), Normalize.boolCanon(col("c1")).as("c2"))
          .collect()
        assert(out.forall(r => r.getString(0) != null))
        assert(out.forall(r => r.getString(0) == r.getString(1))) // idempotent
        assert(out.forall(r => !Set("True", "t", "False", "f")
          .contains(r.getString(0)))) // canonical forms only survive
      }
    }
  }

  private val batchGen: Gen[List[(String, String, String)]] =
    Gen.listOf(for {
      id <- Gen.chooseNum(1, 20)
      payload <- Gen.alphaStr.map(_.take(5))
      day <- Gen.chooseNum(1, 27)
    } yield (id.toString, payload, f"2024-01-$day%02d 00:00:00"))

  test("upsert merge: result keys = union of keys; new always beats old") {
    samples(Gen.zip(batchGen, batchGen), 6)
      .filter { case (b, o) => b.nonEmpty || o.nonEmpty }
      .foreach { case (b, o) =>
      {
        val newDf = b.toDF("id", "payload", "updated_at")
        val oldDf = o.toDF("id", "payload", "updated_at")
        val out = Upsert.merge(newDf, oldDf, "id", "updated_at").collect()
        val keys = out.map(_.getString(0)).toSet
        assert(keys == (b.map(_._1) ++ o.map(_._1)).toSet)
        assert(out.length == keys.size) // exactly one row per key
        // any key present in new must resolve to a new-batch payload
        val newKeys = b.groupBy(_._1)
        out.foreach { r =>
          if (newKeys.contains(r.getString(0)))
            assert(newKeys(r.getString(0))
              .exists(t => t._2 == r.getString(1)))
        }
      }
    }
  }

  test("jaccard: bounded [0,1], symmetric, 1 on self") {
    val texts = Gen.listOfN(2, Gen.nonEmptyListOf(
      Gen.oneOf("spark", "scan", "merge", "join", "the", "a"))
      .map(_.mkString(" ")))
    samples(texts, 8).filter(_.size == 2).foreach { ts =>
      {
        val df = Seq((ts.head, ts(1))).toDF("a", "b")
        val sh = (c: String) => Dedup.wordShingles(col(c), 2)
        val r = df.select(
          Dedup.jaccard(sh("a"), sh("b")).as("ab"),
          Dedup.jaccard(sh("b"), sh("a")).as("ba"),
          Dedup.jaccard(sh("a"), sh("a")).as("aa")).collect()(0)
        assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
        assert(r.getDouble(0) == r.getDouble(1)) // symmetric
        val selfJ = r.getDouble(2)
        assert(selfJ == 1.0 || ts.head.split("\\s+").length < 2)
      }
    }
  }

  test("fingerprint: deterministic and order-sensitive") {
    samples(Gen.zip(Gen.alphaStr, Gen.alphaStr), 8).foreach { case (a, b) =>
      val df = Seq((a, a, a + b, b + a)).toDF("x1", "x2", "ab", "ba")
      val r = df.select(
        graft.ext.TextAnalysis.fingerprint(col("x1")),
        graft.ext.TextAnalysis.fingerprint(col("x2")),
        graft.ext.TextAnalysis.fingerprint(col("ab")),
        graft.ext.TextAnalysis.fingerprint(col("ba"))).collect()(0)
      assert(r.getLong(0) == r.getLong(1)) // deterministic
      if (a.nonEmpty && b.nonEmpty && a != b)
        assert(r.getLong(2) != r.getLong(3) || a + b == b + a)
    }
  }
}
