package graft.ext

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** REAL video container handling for the multimodal column surface —
  * RIFF/AVI mux + demux implemented directly (RIFF is a 3-fourcc
  * framing discipline, the same one WAV uses; parsing it IS the
  * demux step a video pipeline needs), with INTRA-CODED frames
  * through the real `javax.imageio` codec ([[Images.MediaCodec]]):
  * the MJPEG discipline — every frame its own still image — carried
  * by a lossless intra codec (PNG) so the analytic oracle survives
  * end-to-end. What stays honestly out of scope is INTER-frame
  * compressed codecs (H.264/VP9 — FFmpeg-class territory, see
  * [[Multimodal.FakeDecoder]]); the container walk, frame extraction,
  * per-frame decode, and temporal feature chain here are the real
  * thing.
  *
  * Scale shape: payloads never touch the driver — mux and demux both
  * stream through `mapPartitions`, one frame in flight at a time
  * (the demuxer is an iterator over chunk offsets, never a
  * materialized frame list); the corpus-wide state is the slim
  * (media_id, frame_idx, 64-bit dHash) table — 24 bytes per FRAME
  * whatever the resolution; the temporal window (consecutive-frame
  * Hamming) partitions by media_id with ≤ frames-per-clip rows, never
  * a corpus-wide window.
  *
  * The synthetic fixture: clip of `4 + pid % 5` frames, two scenes —
  * frames before `cut = 2 + pid % 3` render pattern `pid·8`, frames
  * from the cut render `pid·8 + 1` ([[Images.grayAt]] formulas, so
  * DuckDB replays every pixel). Consecutive frames within a scene are
  * pixel-identical (Hamming 0); the cut shows up as the one non-zero
  * consecutive Hamming — the scene-change detector's designed
  * positive. Clips whose cut index falls beyond the last frame are
  * single-scene: designed NEGATIVES the detector must stay quiet on
  * (spec-pinned). Copies follow the corpus-wide baseId rule so the
  * near-dup machinery sees clip-level structure too. */
object Video {

  val FrameW: Int = Images.DefaultW
  val FrameH: Int = Images.DefaultH

  def nFrames(pid: Long): Int = (4L + pid % 5L).toInt
  def cutAt(pid: Long): Int = (2L + pid % 3L).toInt

  /** Pattern id of frame `f` in clip `pid`: scene 1 before the cut,
    * scene 2 from it. */
  def framePid(pid: Long, f: Int): Long =
    pid * 8L + (if (f >= cutAt(pid)) 1L else 0L)

  // ---------------------------------------------------------- RIFF mux

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(fourcc(id)); bos.write(le32(body.length)); bos.write(body)
    if (body.length % 2 == 1) bos.write(0) // RIFF pads chunks to even
    bos.toByteArray
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(fourcc("LIST")); bos.write(le32(body.length + 4))
    bos.write(fourcc(listType)); bos.write(body)
    bos.toByteArray
  }

  /** Mux already-encoded intra frames into a RIFF/AVI container:
    * `avih` main header, one `vids` stream (`strh`/`strf`), frames as
    * `00dc` chunks in the `movi` list, `idx1` index — the standard
    * layout, with real even-byte chunk padding (PNG frames are
    * odd-sized about half the time, so the padding path is exercised
    * constantly, not theoretically). */
  def muxAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
      fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "cannot mux an empty clip")
    val maxBuf = frames.map(_.length).max
    val avih = {
      val b = new ByteArrayOutputStream()
      b.write(le32(1000000 / fps)); b.write(le32(maxBuf * fps))
      b.write(le32(0)); b.write(le32(0x10)) // AVIF_HASINDEX
      b.write(le32(frames.length)); b.write(le32(0)); b.write(le32(1))
      b.write(le32(maxBuf)); b.write(le32(w)); b.write(le32(h))
      (0 until 4).foreach(_ => b.write(le32(0)))
      b.toByteArray
    }
    val strh = {
      val b = new ByteArrayOutputStream()
      b.write(fourcc("vids")); b.write(fourcc("MPNG"))
      b.write(le32(0)); b.write(le32(0)); b.write(le32(0))
      b.write(le32(1)); b.write(le32(fps)) // scale/rate
      b.write(le32(0)); b.write(le32(frames.length))
      b.write(le32(maxBuf)); b.write(le32(-1)); b.write(le32(0))
      b.write(le32(0)); b.write(le32((h << 16) | w))
      b.toByteArray
    }
    val strf = { // BITMAPINFOHEADER with the intra-codec fourcc
      val b = new ByteArrayOutputStream()
      b.write(le32(40)); b.write(le32(w)); b.write(le32(h))
      b.write(le32((24 << 16) | 1)) // planes=1, bpp=24
      b.write(fourcc("MPNG")); b.write(le32(w * h * 3))
      b.write(le32(0)); b.write(le32(0)); b.write(le32(0)); b.write(le32(0))
      b.toByteArray
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl",
        chunk("strh", strh) ++ chunk("strf", strf)))
    val moviBody = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    frames.foreach { f =>
      offsets += ((moviBody.size() + 4, f.length))
      moviBody.write(chunk("00dc", f))
    }
    val movi = list("movi", moviBody.toByteArray)
    val idx1 = {
      val b = new ByteArrayOutputStream()
      offsets.foreach { case (off, len) =>
        b.write(fourcc("00dc")); b.write(le32(0x10)) // AVIIF_KEYFRAME
        b.write(le32(off)); b.write(le32(len))
      }
      b.toByteArray
    }
    val body = fourcc("AVI ") ++ hdrl ++ movi ++ chunk("idx1", idx1)
    val out = new ByteArrayOutputStream()
    out.write(fourcc("RIFF")); out.write(le32(body.length))
    out.write(body)
    out.toByteArray
  }

  // -------------------------------------------------------- RIFF demux

  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def cc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** REAL container demux: walk the RIFF chunk tree (recursing into
    * LISTs, honoring even-byte padding) and return the video-stream
    * frame payloads (`00dc`/`00db` chunks) as an ITERATOR of
    * (frame_idx, bytes) — offsets are resolved lazily, so a clip's
    * frames never exist in memory together. Loud on a non-RIFF/AVI
    * payload — a silent empty demux is how corrupt media poisons a
    * corpus. */
  def demuxFrames(avi: Array[Byte]): Iterator[(Int, Array[Byte])] = {
    require(avi.length >= 12 && cc(avi, 0) == "RIFF" &&
      cc(avi, 8) == "AVI ", "payload is not a RIFF/AVI container")
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = cc(avi, off)
        val size = rdLe32(avi, off + 4)
        // corrupt-size guard: a negative or out-of-bounds chunk size
        // would stall the walk (off advancing by <= 0) or read past
        // the payload — a crafted/truncated AVI must FAIL the task
        // loudly, never wedge it
        if (size < 0 || off + 8 + size > to)
          throw new IllegalArgumentException(
            s"corrupt RIFF chunk '$id' at offset $off: size $size " +
              s"exceeds container bound $to")
        if (id == "LIST") walk(off + 12, off + 8 + size)
        else if (id == "00dc" || id == "00db")
          offsets += ((off + 8, size))
        off += 8 + size + (size % 2) // skip the pad byte on odd sizes
      }
    }
    val declared = rdLe32(avi, 4)
    require(declared >= 4 && 8 + declared <= avi.length,
      s"corrupt RIFF header: declared size $declared vs ${avi.length}")
    walk(12, 8 + declared)
    offsets.iterator.zipWithIndex.map { case ((off, len), i) =>
      (i, java.util.Arrays.copyOfRange(avi, off, off + len))
    }
  }

  final case class AviRow(media_id: Long, payload: Array[Byte])
  final case class FrameHash(media_id: Long, frame_idx: Int, dhash: Long)

  /** Materialize the synthetic AVI media frame for a corpus id
    * column: payload = real RIFF/AVI bytes with real PNG frames.
    * Mux streams per partition — no clip ever exists on the driver. */
  def syntheticAviFrame(spark: SparkSession, docs: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        val codec = Images.partitionCodec()
        ids.map { id =>
          val pid = Images.baseId(id)
          val frames = (0 until nFrames(pid)).map { f =>
            codec.encode(Images.renderPatternImage(framePid(pid, f),
              FrameW, FrameH))
          }
          AviRow(id, muxAvi(frames, FrameW, FrameH))
        }
      }
      .toDF()
      .select(col("media_id"), col("payload"),
        struct(lit("video").as("kind"),
          octet_length(col("payload")).as("n_bytes")).as("meta"))
  }

  /** Demux + decode + fingerprint every frame: (media_id, frame_idx,
    * dhash). One demux+decode pass per partition; output is 24
    * bytes/FRAME whatever the resolution — the whole temporal
    * analysis downstream runs on this slim table. */
  def frameHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[AviRow]
      .mapPartitions { rows =>
        val codec = Images.partitionCodec()
        rows.flatMap { r =>
          demuxFrames(r.payload).map { case (i, png) =>
            FrameHash(r.media_id,
              i, Images.dHash64(Images.gridOf(codec.decode(png))))
          }
        }
      }
      .toDF()
  }

  final case class VideoMeta(media_id: Long, n_frames: Int,
      width: Int, height: Int)

  /** DECODED clip geometry — frame count from the real demux walk,
    * dimensions from DECODING the first frame (never from the avih
    * header: containers lie, rasters don't — the [[Images.decodedMeta]]
    * honesty rule at the clip level). One demux + one image decode
    * per clip; output 20 bytes/row. The honest input for video
    * patch-token costing (cost = n_frames × patches-per-frame). */
  def decodedMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[AviRow]
      .mapPartitions { rows =>
        val codec = Images.partitionCodec()
        rows.map { r =>
          var n = 0; var w = 0; var h = 0
          demuxFrames(r.payload).foreach { case (i, bytes) =>
            if (i == 0) {
              val img = codec.decode(bytes)
              w = img.getWidth; h = img.getHeight
            }
            n += 1
          }
          VideoMeta(r.media_id, n, w, h)
        }
      }
      .toDF()
  }

  /** Scene-change detection over a corpus id column: synthesize
    * AVIs → demux → decode frames → dHash → consecutive-frame
    * Hamming (media-keyed lag window — bounded by frames-per-clip,
    * never corpus-wide). Returns (media_id, frame_idx ≥ 1, hamming,
    * is_cut = hamming > 0) — the exact surface the q237 oracle
    * replays analytically. */
  def sceneCuts(spark: SparkSession, docs: DataFrame,
      idCol: String): DataFrame = {
    val hashes = frameHashes(spark, syntheticAviFrame(spark, docs, idCol))
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    hashes
      .withColumn("_prev", lag(col("dhash"), 1).over(w))
      .filter(col("_prev").isNotNull)
      .withColumn("hamming",
        bit_count(expr("dhash ^ _prev")).cast("int"))
      .select(col("media_id"), col("frame_idx"), col("hamming"),
        (col("hamming") > 0).as("is_cut"))
  }
}
