package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs batched per partition. IMAGE decode is REAL —
  * [[Images]] runs the JDK's `javax.imageio` PNG/JPEG codecs on the
  * executors (encode, decode, exact rational-area resize over any
  * (w, h), 64-bit dHash, banded Hamming near-dup; the q231/q234
  * oracles prove the chain lossless). AUDIO decode is REAL too —
  * [[Audio]] runs the JDK's `javax.sound.sampled` WAV codec
  * (RIFF/WAVE encode+decode, integral features, 64-bit
  * energy-gradient fingerprint; q235/q236). Only payload kinds with
  * no in-JDK decoder remain stubbed — compressed audio/video
  * CONTAINERS (mp3/mp4/mkv need FFmpeg-class libs the container
  * lacks): for those `FakeDecoder` is the deterministic stand-in
  * with the same signature, so the partition-streaming plumbing —
  * schema, binary handling, batching, output shape — stays exercised
  * end-to-end for every kind.
  *
  * Scale: payloads never pass through the driver; mapPartitions streams
  * executor-local batches, and the metadata struct lets planners prune
  * (filter on kind/bytes) *without touching payload bytes* — projection
  * pushdown drops the heavy column when a query needs only metadata.
  */
object Multimodal {

  val MediaKinds = Seq("image", "audio", "video", "text")

  /** Wrap a source frame into the multimodal layout: opaque payload +
    * metadata struct. (In production the payload column arrives from the
    * object store; here it is synthesized from text bytes.) */
  def toMediaFrame(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        element_at(array(MediaKinds.map(lit): _*),
          (col(idCol) % MediaKinds.size + 1).cast("int")).as("kind"),
        octet_length(encode(col(textCol), "UTF-8")).as("n_bytes")
      ).as("meta"))

  final case class MediaRow(media_id: Long, payload: Array[Byte],
      kind: String)
  final case class MediaFeatures(media_id: Long, kind: String,
      n_bytes: Int, checksum: Long, features: Array[Double])

  /** STUB — deterministic fake decode. A real implementation would
    * decode image/audio frames here; this computes a byte-level
    * checksum + 8 bucket-histogram features so the distributed plumbing
    * is exercised end-to-end with verifiable output. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Long, Array[Double]) = {
      var cs = 0L
      val hist = new Array[Double](8)
      var i = 0
      while (i < payload.length) {
        cs = (cs * 31 + (payload(i) & 0xff)) % 1000000007L
        hist((payload(i) & 0xff) % 8) += 1.0
        i += 1
      }
      (cs, hist)
    }
  }

  /** Batched per-partition decode — the Scala analogue of a
    * `mapInPandas` decode stage: one decoder instance per partition,
    * streaming rows, never materializing the partition. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.kind").as("kind"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (cs, hist) = FakeDecoder.decode(r.payload)
          MediaFeatures(r.media_id, r.kind, r.payload.length, cs, hist)
        }
      }
  }

  final case class Frame(media_id: Long, frame_idx: Int, n_bytes: Int,
      n_resized: Int)

  /** Frame-sample + resize over video payloads: split the opaque
    * payload into fixed-size frames (STUB for a container demuxer),
    * keep every `stride`-th frame, "resize" each (STUB: byte
    * decimation by `resizeStep`). flatMap over an iterator — one frame
    * in flight per row, so a 10 GB video never materializes all its
    * frames in executor memory; the expansion happens AFTER
    * partitioning, so frame fan-out multiplies rows, not shuffle input. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 256, stride: Int = 2, resizeStep: Int = 4)
      : Dataset[Frame] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, p) =>
          val nFrames = (p.length + frameBytes - 1) / frameBytes
          (0 until nFrames by stride).iterator.map { fi =>
            val len = math.min(frameBytes, p.length - fi * frameBytes)
            Frame(id, fi, len, (len + resizeStep - 1) / resizeStep)
          }
        }
      }
  }

  /** Magic-byte payload-kind sniffing — dispatch is a property of the
    * PAYLOAD, never of metadata (a scraped corpus lies about
    * content-types constantly): RIFF containers split on their form
    * fourcc (WAVE → audio, AVI → video), PNG/JPEG magics → image.
    * Loud on anything else. */
  def sniffKind(b: Array[Byte]): String = {
    def cc(off: Int) = new String(b, off, 4, "US-ASCII")
    if (b.length >= 12 && cc(0) == "RIFF") {
      cc(8) match {
        case "WAVE" => "audio"
        case "AVI " => "video"
        case other => throw new IllegalArgumentException(
          s"unrecognized RIFF form: $other")
      }
    } else if (b.length >= 2 &&
      (((b(0) & 0xff) == 0x89 && b(1) == 'P') ||
        ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8))) "image"
    else throw new IllegalArgumentException(
      s"unrecognized payload magic: ${b.take(4).mkString(",")}")
  }

  final case class UnifiedFp(media_id: Long, kind: String,
      fp_lo: Long, fp_hi: Long)

  /** ONE decode pass over a MIXED-modality media frame: sniff each
    * payload's kind from its magic bytes and route to the matching
    * REAL codec — image → `javax.imageio` → dHash, audio →
    * `javax.sound` WAV → energy-gradient fingerprint, video →
    * RIFF/AVI demux → first-frame dHash — emitting one unified
    * 64-bit fingerprint per payload (split into two non-negative
    * 32-bit words for the oracle). This is the dispatch shape a real
    * corpus-wide media pass needs: one partition stream, one codec
    * set, kind decided per ROW. Payloads never shuffle; output is
    * ~28 bytes/row. */
  def unifiedFingerprints(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = Images.partitionCodec()
        rows.map { case (id, payload) =>
          val kind = sniffKind(payload)
          val fp = kind match {
            case "image" =>
              Images.dHash64(Images.gridOf(codec.decode(payload)))
            case "audio" =>
              Audio.fingerprint64(Audio.decodeWav(payload))
            case "video" =>
              val frames = Video.demuxFrames(payload)
              // a structurally valid AVI with no video chunks (real
              // scraped files: audio-only or empty movi) must name
              // the payload problem, not die as NoSuchElementException
              if (!frames.hasNext) throw new IllegalArgumentException(
                s"media $id: AVI container holds no video frames")
              Images.dHash64(Images.gridOf(codec.decode(frames.next()._2)))
          }
          UnifiedFp(id, kind, fp & 0xffffffffL, fp >>> 32)
        }
      }
      .toDF()
  }

  /** The mixed-modality synthetic frame: kind cycles with the id
    * (id%3 = 0 → PNG image, 1 → WAV audio, 2 → AVI video), every
    * payload a REAL container through its family's synthesis chain
    * — the q242 fixture. */
  def syntheticMixedFrame(spark: SparkSession, docs: DataFrame,
      idCol: String): DataFrame = {
    val img = Images.syntheticPngFrame(spark,
        docs.filter(col(idCol) % 3 === 0), idCol)
      .select(col("media_id"), col("payload"))
    val aud = Audio.syntheticWavFrame(spark,
        docs.filter(col(idCol) % 3 === 1), idCol)
      .select(col("media_id"), col("payload"))
    val vid = Video.syntheticAviFrame(spark,
        docs.filter(col(idCol) % 3 === 2), idCol)
      .select(col("media_id"), col("payload"))
    img.unionByName(aud).unionByName(vid)
  }

  /** The mixed frame with kind GROUPED in runs of four ids
    * ((id div 4) % 3 — vs [[syntheticMixedFrame]]'s per-id cycle):
    * the corpus-wide copy rules place designed duplicates at
    * ADJACENT ids ((k−1, k) at k%25 = 0 / k%50 = 7), so the per-id
    * cycle puts every designed pair in two different kinds and a
    * within-kind dedup surface would be vacuously empty. Grouping by
    * fours keeps most designed pairs inside one modality — the
    * fixture a mixed-archive DEDUP (q248) needs, where q242 only
    * needed fingerprints. */
  def syntheticMixedFrameGrouped(spark: SparkSession, docs: DataFrame,
      idCol: String): DataFrame = {
    val kindOf = expr(s"cast($idCol as long) div 4") % 3
    val img = Images.syntheticPngFrame(spark,
        docs.filter(kindOf === 0), idCol)
      .select(col("media_id"), col("payload"))
    val aud = Audio.syntheticWavFrame(spark,
        docs.filter(kindOf === 1), idCol)
      .select(col("media_id"), col("payload"))
    val vid = Video.syntheticAviFrame(spark,
        docs.filter(kindOf === 2), idCol)
      .select(col("media_id"), col("payload"))
    img.unionByName(aud).unionByName(vid)
  }

  /** Payload-level near-duplicate pairs — the perceptual-hash stand-in
    * for image/audio dedup: SimHash over character shingles of the hex
    * rendering of the opaque binary payload (`gram` hex chars ≈
    * gram/2 bytes, sliding by half-byte), banded with the pigeonhole
    * blocks and Hamming-verified exactly like text SimHash (q137). A
    * real pipeline swaps the hex-shingle tokenization for decoded
    * perceptual features — [[Images.dHashNearDupPairs]] IS that
    * pipeline for PNG payloads (real decode → dHash bits →
    * [[graft.ext.Dedup.hammingPairsFromFingerprints]]); this variant
    * stays as the fallback for opaque payloads with no registered
    * decoder. The Spark-side shape — map-only fingerprint, slim
    * banded shuffle, exact verify — is identical. Returns
    * (doc_a, doc_b, hamming) on media_id.
    *
    * Engine-portable end to end (hex ↔ DuckDB hex(), shingles ↔
    * char slices, poly hash ↔ q31 fold), so the q182 oracle replays
    * the full brute-force pair surface — which doubles as the
    * pigeonhole recall proof at this tokenization too. */
  def payloadNearDupPairs(docs: DataFrame, textCol: String, idCol: String,
      gram: Int = 8, maxDist: Int = 2, chunks: Int = 4, nBits: Int = 48,
      seed: Long = 77L): DataFrame = {
    require(gram >= 1)
    val media = toMediaFrame(docs, textCol, idCol)
      .select(col("media_id"),
        graft.functions.VectorFunctions.shingles(
          hex(col("payload")), gram, word = false).as("_sh"))
    graft.ext.Dedup.simHashPairsFromTokenArrays(media, "_sh",
      "media_id", maxDist, chunks, nBits, seed)
  }
}
