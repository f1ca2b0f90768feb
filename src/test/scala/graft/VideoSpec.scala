package graft

import graft.ext.{Images, Video}

/** Round-11: the REAL video container chain. The RIFF/AVI mux must
  * demux back to the exact frame payloads (container losslessness,
  * incl. the odd-size padding path), the per-frame decode must ride
  * the real image codec, and the designed two-scene structure must
  * surface as exactly one cut per clip. */
class VideoSpec extends SparkSpec {

  import spark.implicits._

  test("mux->demux round-trips every frame byte-exactly, including " +
      "odd-sized frames (RIFF even-byte padding)") {
    val frames = Seq(
      Array.tabulate(101)(i => (i * 7).toByte),  // odd size -> padded
      Array.tabulate(256)(i => (i * 3).toByte),
      Array.tabulate(33)(i => (i ^ 0x5a).toByte)) // odd again
    val avi = Video.muxAvi(frames, 36, 32)
    assert(new String(avi.take(4), "US-ASCII") == "RIFF" &&
      new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val back = Video.demuxFrames(avi).toSeq
    assert(back.map(_._1) == Seq(0, 1, 2))
    back.zip(frames).foreach { case ((_, got), want) =>
      assert(java.util.Arrays.equals(got, want), "frame bytes diverged")
    }
  }

  test("demux is loud on non-AVI payloads (RIFF-but-WAV included)") {
    intercept[IllegalArgumentException] {
      Video.demuxFrames(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 9))
    }
    // a real RIFF container of the WRONG kind: WAV from the audio path
    val wav = graft.ext.Audio.encodeWav(Array.tabulate(100)(_.toShort))
    intercept[IllegalArgumentException] { Video.demuxFrames(wav) }
  }

  test("frame decode through the container equals direct pattern " +
      "rendering (mux->demux->decode lossless end to end)") {
    val codec = new Images.MediaCodec()
    try {
      for (id <- Seq(0L, 5L, 25L, 57L)) {
        val pid = Images.baseId(id)
        val frame = Video.syntheticAviFrame(spark,
          Seq(id).toDF("doc_id"), "doc_id")
        val payload = frame.select("payload").collect()(0)
          .getAs[Array[Byte]](0)
        val decoded = Video.demuxFrames(payload).map { case (i, png) =>
          i -> Images.gridOf(codec.decode(png))
        }.toMap
        assert(decoded.size == Video.nFrames(pid))
        for (f <- 0 until Video.nFrames(pid)) {
          val want = Images.gridOf(Images.renderPatternImage(
            Video.framePid(pid, f), Video.FrameW, Video.FrameH))
          assert(decoded(f).sameElements(want),
            s"frame $f of clip $id diverged through the container")
        }
      }
    } finally codec.dispose()
  }

  test("decodedMeta: frame count from the real demux walk, dims from " +
      "the decoded first frame — both match the synthesis design") {
    val ids = (0L until 40L).toDF("doc_id")
    val got = Video.decodedMeta(spark,
        Video.syntheticAviFrame(spark, ids, "doc_id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(got.keySet == (0L until 40L).toSet)
    for (id <- 0L until 40L) {
      val pid = Images.baseId(id)
      assert(got(id) == ((Video.nFrames(pid), Video.FrameW,
        Video.FrameH)), s"meta diverged for clip $id")
    }
  }

  test("sceneCuts: exactly one non-zero consecutive Hamming per clip " +
      "at the designed cut index; copies share their base's cuts") {
    val n = 120L
    val got = Video.sceneCuts(spark, (0L until n).toDF("doc_id"),
        "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    val byClip = got.groupBy(_._1)
    assert(byClip.keySet == (0L until n).toSet)
    for ((id, rows) <- byClip) {
      val pid = Images.baseId(id)
      assert(rows.length == Video.nFrames(pid) - 1,
        s"clip $id: wrong consecutive-pair count")
      val cuts = rows.filter(_._4).map(_._2).sorted.toSeq
      // clips whose designed cut index falls beyond the last frame are
      // single-scene — the detector must stay QUIET there (designed
      // negatives); elsewhere exactly the one designed cut (the two
      // scene patterns could in principle alias to one dHash; on this
      // fixture they never do)
      val want =
        if (Video.cutAt(pid) < Video.nFrames(pid)) Seq(Video.cutAt(pid))
        else Seq.empty[Int]
      assert(cuts == want, s"clip $id: cuts at $cuts, designed $want")
      rows.filter(!_._4).foreach { case (_, _, hamm, _) =>
        assert(hamm == 0, s"clip $id: in-scene frames not identical")
      }
    }
    // every 25th clip is an exact copy of its predecessor
    for (id <- 25L until n by 25L)
      assert(byClip(id).map(r => (r._2, r._3)).toSet ==
        byClip(id - 1).map(r => (r._2, r._3)).toSet,
        s"copied clip $id diverged from its base")
  }
}
