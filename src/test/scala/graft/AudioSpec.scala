package graft

import graft.ext.{Audio, Dedup, Images}

/** Round-11: the REAL audio codec chain. The WAV written by
  * `javax.sound.sampled` must decode back to the exact samples
  * (PCM losslessness through the real RIFF container), the banded
  * Hamming join must equal brute force over the decoded
  * fingerprints, and the designed duplicate structure must
  * surface. */
class AudioSpec extends SparkSpec {

  import spark.implicits._

  test("WAV encode->decode round-trips every sample exactly, " +
      "including the int16 extremes") {
    val extremes = Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1,
      -32767, 32766) ++ Array.tabulate(200)(i =>
      Audio.sampleAt(42L, perturb = false, i))
    val back = Audio.decodeWav(Audio.encodeWav(extremes))
    assert(back.sameElements(extremes))
    for (id <- Seq(0L, 7L, 25L, 57L, 499L)) {
      val pid = Images.baseId(id)
      val clip = Array.tabulate(Audio.clipLen(pid))(i =>
        Audio.sampleAt(pid, Images.isPerturbed(id), i))
      assert(Audio.decodeWav(Audio.encodeWav(clip)).sameElements(clip),
        s"WAV round-trip diverged for id=$id")
    }
  }

  test("decodeWav is loud on non-audio payloads and the synthetic " +
      "frame carries real RIFF/WAVE containers") {
    intercept[Exception] {
      Audio.decodeWav(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    }
    val frame = Audio.syntheticWavFrame(spark,
      (0L until 5L).toDF("doc_id"), "doc_id")
    val payloads = frame.select("payload").collect()
      .map(_.getAs[Array[Byte]](0))
    payloads.foreach { p =>
      assert(new String(p.take(4), "US-ASCII") == "RIFF" &&
        new String(p.slice(8, 12), "US-ASCII") == "WAVE",
        "payload is not a RIFF/WAVE container")
    }
  }

  test("features: Spark decode path equals a direct sample-formula " +
      "replay (counts, magnitude mass, energy, zero crossings, " +
      "fingerprint words)") {
    val ids = (0L until 80L).toDF("doc_id")
    val got = Audio.features(spark,
        Audio.syntheticWavFrame(spark, ids, "doc_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    for (id <- 0L until 80L) {
      val pid = Images.baseId(id)
      val s = Array.tabulate(Audio.clipLen(pid))(i =>
        Audio.sampleAt(pid, Images.isPerturbed(id), i))
      val sumAbs = s.map(v => math.abs(v.toLong)).sum
      val sumSq = s.map(v => v.toLong * v).sum
      val zc = (1 until s.length).count(i => (s(i - 1) < 0) != (s(i) < 0))
      val fp = Audio.fingerprint64(s)
      assert(got(id) == ((s.length.toLong, sumAbs, sumSq, zc.toLong,
        fp & 0xffffffffL, fp >>> 32)), s"features diverged for id=$id")
    }
  }

  test("banded Hamming join == brute force over decoded " +
      "fingerprints; designed copies surface at Hamming 0") {
    val n = 300L
    val ids = (0L until n).toDF("doc_id")
    val got = Audio.fingerprintNearDupPairs(spark, ids, "doc_id",
        maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val fps = (0L until n).map { id =>
      val pid = Images.baseId(id)
      id -> Audio.fingerprint64(Audio.decodeWav(Audio.encodeWav(
        Array.tabulate(Audio.clipLen(pid))(i =>
          Audio.sampleAt(pid, Images.isPerturbed(id), i)))))
    }
    val want = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 2
    } yield (a, b, d)).toSet
    assert(got == want)
    for (id <- 25L until n by 25L)
      assert(got.contains((id - 1, id, 0)), s"missing exact dup at $id")
  }

  test("fingerprint bins: every bin non-empty at the minimum clip " +
      "length, and hammingPairsFromFingerprints handles the bit-63 " +
      "gradient (bin 64 vs 63)") {
    // a clip engineered so bin k sums strictly increase -> all 64 bits
    val n = Audio.Bins * 10
    val rising = Array.tabulate(n)(i => (i / 10 * 40).toShort)
    assert(Audio.fingerprint64(rising) == -1L) // all 64 bits set
    val flat = Array.fill(n)(100.toShort)
    assert(Audio.fingerprint64(flat) == 0L)
    val fps = Seq((1L, -1L), (2L, -1L ^ (1L << 63)), (3L, 0L))
      .toDF("id", "fp")
    val got = Dedup.hammingPairsFromFingerprints(fps, "id", "fp",
        maxDist = 1, chunks = 4, nBits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 1)))
  }
}
