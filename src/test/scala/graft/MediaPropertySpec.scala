package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ext.{Audio, Dedup, Images, Video}

/** Property-based invariants for the media codec chains — randomized
  * inputs driven through the REAL codecs, checked against independent
  * BigInt/brute-force references (the fixed-id specs pin designed
  * cases; these sweep the space). */
class MediaPropertySpec extends SparkSpec {

  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("gridOf: PNG round-trip equals the BigInt rational box " +
      "average for RANDOM dimensions and patterns") {
    val gen = for {
      pid <- Gen.chooseNum(0L, 1000000L)
      w <- Gen.chooseNum(9, 41)
      h <- Gen.chooseNum(8, 37)
    } yield (pid, w, h)
    val codec = new Images.MediaCodec()
    try {
      samples(gen, 25).foreach { case (pid, w, h) =>
        val img = Images.renderPatternImage(pid, w, h)
        val got = Images.gridOf(codec.decode(codec.encode(img)))
        val want = Array.tabulate(72) { k =>
          val cy = k / 9; val cx = k % 9
          var s = BigInt(0)
          for (y <- 0 until h; x <- 0 until w) {
            val ox = math.min((cx + 1L) * w, (x + 1L) * 9) -
              math.max(cx.toLong * w, x.toLong * 9)
            val oy = math.min((cy + 1L) * h, (y + 1L) * 8) -
              math.max(cy.toLong * h, y.toLong * 8)
            if (ox > 0 && oy > 0)
              s += BigInt(ox) * oy * Images.grayAt(pid, perturb = false, x, y)
          }
          (s / (BigInt(w) * h)).toInt
        }
        assert(got.sameElements(want), s"grid diverged at pid=$pid ${w}x$h")
      }
    } finally codec.dispose()
  }

  test("WAV: encode->decode round-trips RANDOM sample arrays exactly") {
    val gen = Gen.chooseNum(65, 400).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Short.MinValue, Short.MaxValue)))
    samples(gen, 30).foreach { vs =>
      val arr = vs.map(_.toShort).toArray
      assert(Audio.decodeWav(Audio.encodeWav(arr)).sameElements(arr))
    }
  }

  test("RIFF/AVI: mux->demux round-trips RANDOM frame payloads " +
      "(odd and even sizes) byte-exactly in order") {
    val frameGen = Gen.chooseNum(1, 300).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)))
    val clipGen = Gen.chooseNum(1, 9).flatMap(k =>
      Gen.listOfN(k, frameGen))
    samples(clipGen, 25).foreach { frames =>
      val arrs = frames.map(_.toArray)
      val back = Video.demuxFrames(Video.muxAvi(arrs, 16, 16)).toSeq
      assert(back.map(_._1) == arrs.indices.toList)
      back.zip(arrs).foreach { case ((_, got), want) =>
        assert(java.util.Arrays.equals(got, want))
      }
    }
  }

  test("hammingDeltaPairsFromFingerprints == full join filtered to " +
      "delta-touching for RANDOM fingerprint universes and splits") {
    val gen = for {
      n <- Gen.chooseNum(6, 40)
      fps <- Gen.listOfN(n, Gen.long)
      cut <- Gen.chooseNum(1, n - 1)
    } yield (fps.zipWithIndex.map { case (f, i) => (i.toLong, f) }, cut)
    samples(gen, 12).foreach { case (rows, cut) =>
      // seed near-dups so maxDist=3 actually matches sometimes
      val seeded = rows ++ rows.take(3).map { case (id, f) =>
        (id + 1000L, f ^ (1L << (id % 64).toInt))
      }
      val (baseR, deltaR) = seeded.splitAt(cut)
      val base = baseR.toDF("id", "fp")
      val delta = deltaR.toDF("id", "fp")
      val got = Dedup.hammingDeltaPairsFromFingerprints(base, delta,
          "id", "fp", maxDist = 3, chunks = 4, nBits = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      val deltaIds = deltaR.map(_._1).toSet
      val want = (for {
        (a, fa) <- seeded; (b, fb) <- seeded if a < b
        if deltaIds.contains(a) || deltaIds.contains(b)
        d = java.lang.Long.bitCount(fa ^ fb) if d <= 3
      } yield (a, b, d)).toSet
      assert(got == want, s"delta parity broke at cut=$cut n=${seeded.size}")
    }
  }
}
