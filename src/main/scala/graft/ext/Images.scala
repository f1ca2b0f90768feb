package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** REAL image decode for the multimodal column surface — the JDK's
  * built-in `javax.imageio` codecs (PNG and JPEG), no external
  * dependency: opaque `binary` payloads are format-sniffed by magic
  * bytes, decoded to an 8-bit grayscale raster on the executor,
  * area-averaged to the classic 9×8 dHash grid with EXACT integer
  * arithmetic — arbitrary (w, h), no divisibility requirement: each
  * grid cell's value is the floor of a RATIONAL box sum (pixel
  * overlap lengths in a ×9/×8 scaled integer axis — no float
  * resampling anywhere, so any engine that can read the pixels
  * replays the grid bit for bit) — and fingerprinted with the 64-bit
  * difference hash (Krawetz's dHash: bit (row, col) = 1 iff the cell
  * right of (row, col) is brighter). Near-duplicate pairs then ride
  * the SAME pigeonhole-banded Hamming join the text SimHash family
  * uses ([[Dedup.hammingPairsFromFingerprints]]) — this replaces the
  * hex-shingle stand-in ([[Multimodal.payloadNearDupPairs]], kept as
  * the fallback for payloads with no registered decoder).
  *
  * Scale shape: payloads never touch the driver — encode and decode
  * both stream through `mapPartitions` (one codec instance per
  * partition, disposed on task completion, one image in flight per
  * row); the corpus-wide state is the slim (media_id, 64-bit
  * fingerprint) table; pairs come from the banded join (zero false
  * negatives for Hamming ≤ maxDist by the pigeonhole principle,
  * exactly as q137 pins for SimHash).
  *
  * The synthetic pattern behind the test fixture's PNGs is an integer
  * formula of (id, x, y) (SQL-replayable, so the q231/q234 oracles
  * compute the expected dHash ANALYTICALLY while Spark goes through
  * the real encode→decode→resize→hash chain — a hash match proves
  * the whole codec path is lossless-correct, not just plumbed; PNG
  * is lossless, so only PNG fixtures get the analytic oracle — the
  * JPEG path, lossy by design, is pinned by determinism + flow specs
  * instead). Every 25th image is an exact copy of its predecessor
  * (Hamming 0) and every 50th-plus-7 a perturbed copy (first pixel
  * column +16 gray — a near-dup that flips only gradient bits on the
  * grid's left edge). */
object Images {

  /** dHash grid geometry: 9 columns × 8 rows → 8×8 gradient bits. */
  val GridCols = 9
  val GridRows = 8

  /** Default synthetic image size: 4×4 source pixels per grid cell,
    * so the resize step does real area-averaging work. */
  val DefaultW: Int = GridCols * 4
  val DefaultH: Int = GridRows * 4

  /** The duplicate-structure rule of the synthetic fixture: every
    * 25th image repeats its predecessor's pattern exactly; every
    * (50k+7)th repeats its predecessor's pattern perturbed. */
  def baseId(id: Long): Long =
    if (id > 0 && id % 25 == 0) id - 1
    else if (id > 6 && id % 50 == 7) id - 1
    else id

  def isPerturbed(id: Long): Boolean = id > 6 && id % 50 == 7

  /** Synthetic gray value at (x, y) for pattern id `pid` — a pure
    * integer formula (Knuth-mix of pid, then THREE mod-256
    * coordinate forms drawn from bytes 0, 1 and 2 of the mix) that
    * DuckDB replays verbatim; the perturbation brightens the first
    * pixel column by 16. Three coefficient bytes give a 2²⁴ pattern
    * space (~16.7M distinct images) — the round-11 two-byte form
    * aliased at 65,536, so 100k+-image scale probes measured mostly
    * fixture collapse instead of designed duplicates. */
  def grayAt(pid: Long, perturb: Boolean, x: Int, y: Int): Int = {
    val m = (pid * 2654435761L) % 2147483647L
    val v = (m % 256L + 1L) * (7L * x + 13L * y + 1L) +
      ((m / 256L) % 256L) * (x.toLong * x + 11L * y + 3L) +
      ((m / 65536L) % 256L) * (3L * x + 5L * y.toLong * y + 2L) +
      (if (perturb && x == 0) 16L else 0L)
    (v % 256L).toInt
  }

  /** Variable-dimension rule for the mixed-geometry fixture (q234):
    * dims derive from the PATTERN id (copies share their base's
    * geometry, so designed duplicates stay pixel-identical), ranges
    * 10..32 × 9..27 — mostly NOT divisible by the 9×8 grid, so the
    * rational resize path does real fractional-overlap work. Pure
    * integer mod forms, replayed verbatim by the oracle SQL. */
  def varW(pid: Long): Int = (10L + (pid * 7L) % 23L).toInt
  def varH(pid: Long): Int = (9L + (pid * 5L) % 19L).toInt

  // In-memory stream cache: ImageIO's default spills every encode /
  // decode through a temp FILE — at corpus scale that is an fsync per
  // image. Process-wide, set once.
  ImageIO.setUseCache(false)

  /** One REUSABLE codec per partition — `ImageIO.write`/`read`
    * convenience methods scan the service registry per CALL; a
    * million-image partition pays that a million times. This is the
    * "one decoder instance per partition" discipline the multimodal
    * scaladoc promises, made literal. Decoding sniffs the payload's
    * magic bytes (PNG `\x89PNG`, JPEG `\xFF\xD8`) and routes to the
    * matching reader — a real scraped corpus mixes formats row by
    * row, so format is a property of the PAYLOAD, never of the
    * partition. Readers/writers are JDK service instances that must
    * be `dispose()`d or they accumulate on long-lived executors;
    * [[partitionCodec]] registers disposal on task completion.
    * Not thread-safe; one instance per `mapPartitions` closure. */
  final class MediaCodec {
    private val pngWriter = ImageIO.getImageWritersByFormatName("png").next()
    private val pngReader = ImageIO.getImageReadersByFormatName("png").next()
    private val jpgWriter = ImageIO.getImageWritersByFormatName("jpeg").next()
    private val jpgReader = ImageIO.getImageReadersByFormatName("jpeg").next()
    private var disposed = false

    def encode(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = ImageIO.createImageOutputStream(bos)
      pngWriter.setOutput(out)
      pngWriter.write(img)
      out.close()
      bos.toByteArray
    }

    /** JPEG encode at a PINNED explicit quality — the default param
      * object is fine for tests but pinning removes any ambiguity
      * about what the determinism spec actually pins. Lossy: never
      * oracle-checked analytically, only determinism-checked. */
    def encodeJpeg(img: BufferedImage, quality: Float = 0.9f): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = ImageIO.createImageOutputStream(bos)
      jpgWriter.setOutput(out)
      val p = jpgWriter.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      jpgWriter.write(null, new IIOImage(img, null, null), p)
      out.close()
      bos.toByteArray
    }

    /** Format-sniffing decode: PNG or JPEG by magic bytes. */
    def decode(bytes: Array[Byte]): BufferedImage = {
      require(bytes.length >= 2, "payload too short to be an image")
      val reader =
        if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') pngReader
        else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
          jpgReader
        else throw new IllegalArgumentException(
          s"unrecognized image magic: ${bytes(0)},${bytes(1)}")
      val in = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      reader.setInput(in)
      val img = reader.read(0)
      in.close()
      img
    }

    /** Idempotent release of the four JDK codec service instances. */
    def dispose(): Unit = if (!disposed) {
      disposed = true
      pngWriter.dispose(); pngReader.dispose()
      jpgWriter.dispose(); jpgReader.dispose()
    }
  }

  /** The per-partition codec with leak-proof lifetime: on an executor
    * the codec is disposed by the task-completion listener (fires on
    * success, failure, AND early termination — a downstream `limit`
    * that stops consuming the iterator still releases the codec,
    * which an exhaustion-hook wrapper would miss); driver-side
    * (tests, no TaskContext) the caller owns disposal. Shared with
    * the other media modules ([[Video]], [[Multimodal]]) so the
    * disposal idiom has exactly ONE definition. */
  private[ext] def partitionCodec(): MediaCodec = {
    val c = new MediaCodec()
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null)
      tc.addTaskCompletionListener[Unit](_ => c.dispose())
    c
  }

  /** Render the RAW pattern `pid` as an 8-bit grayscale raster — no
    * duplicate-structure rules applied (the [[Video]] frame renderer;
    * clips apply baseId at the CLIP level and derive per-frame
    * pattern ids themselves). */
  def renderPatternImage(pid: Long, w: Int, h: Int,
      pert: Boolean = false): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val data = grayData(img)
    if (data != null) {
      var y = 0
      while (y < h) {
        val row = y * w
        var x = 0
        while (x < w) {
          data(row + x) = grayAt(pid, pert, x, y).toByte
          x += 1
        }
        y += 1
      }
    } else {
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, grayAt(pid, pert, x, y))
          x += 1
        }
        y += 1
      }
    }
    img
  }

  /** Backing byte array of a single-band 8-bit raster when (and only
    * when) the layout is the plain row-major width-stride form — the
    * layout `TYPE_BYTE_GRAY` constructions and the JDK grayscale PNG
    * decode path produce. Returns null for ANY other layout (color,
    * sub-rasters, banked buffers, padded strides): callers must keep
    * their per-sample path for those. Same values as
    * `getSample(x, y, 0)` (`data(y·w + x) & 0xFF`) — this changes
    * access cost only, never arithmetic, so every analytic oracle is
    * unaffected; the per-pixel `getSample`/`setSample` virtual
    * dispatch was the measured CPU tax of the media hot loops (the
    * decode side pays it once per pixel per payload). */
  private[ext] def grayData(img: BufferedImage): Array[Byte] = {
    val r = img.getRaster
    val db = r.getDataBuffer
    r.getSampleModel match {
      case sm: java.awt.image.ComponentSampleModel
        if r.getNumBands == 1 && sm.getPixelStride == 1 &&
           sm.getScanlineStride == img.getWidth &&
           sm.getBandOffsets()(0) == 0 &&
           db.isInstanceOf[java.awt.image.DataBufferByte] &&
           db.getNumBanks == 1 && db.getOffset == 0 &&
           r.getSampleModelTranslateX == 0 &&
           r.getSampleModelTranslateY == 0 =>
        db.asInstanceOf[java.awt.image.DataBufferByte].getData
      case _ => null
    }
  }

  private def renderPattern(id: Long, w: Int, h: Int): BufferedImage =
    renderPatternImage(baseId(id), w, h, isPerturbed(id))

  /** REAL PNG encode via `javax.imageio` (lossless 8-bit grayscale).
    * Driver-side helper (tests/fixtures); the distributed paths use
    * one codec per partition. */
  def encodePng(id: Long, w: Int = DefaultW, h: Int = DefaultH): Array[Byte] = {
    val c = new MediaCodec()
    try c.encode(renderPattern(id, w, h)) finally c.dispose()
  }

  /** REAL decode + exact area-average resize to the 9×8 dHash grid.
    * Driver-side helper; see [[gridOf]] for the arithmetic. */
  def decodeGrayGrid(bytes: Array[Byte]): Array[Int] = {
    val c = new MediaCodec()
    try gridOf(c.decode(bytes)) finally c.dispose()
  }

  /** The EXACT area-average grid over an already-decoded raster,
    * arbitrary (w, h) — no divisibility requirement. Work in a
    * scaled integer axis: horizontally every quantity is multiplied
    * by 9 (GridCols), so cell cx covers [cx·w, (cx+1)·w) and pixel x
    * covers [x·9, (x+1)·9) — both integer intervals; the overlap
    * length ox is exact. Vertically the same with 8 (GridRows).
    * cell(cx, cy) = ⌊ Σ ox·oy·gray(x, y) / (w·h) ⌋ — the rational
    * box average, floor-divided once at the end (the cell's total
    * scaled area is exactly w·h). When w and h ARE divisible the
    * formula reduces algebraically to the plain block mean
    * ⌊Σ/(bw·bh)⌋ (every interior overlap is the full 9 or 8), so the
    * q231 fixed-geometry oracle is unchanged. Reads samples off the
    * raster (never `getRGB` — that would route through sRGB
    * conversion and un-pin the values). COLOR rasters (≥ 3 bands —
    * the JDK PNG/JPEG readers order bands R, G, B whatever the
    * backing byte layout; a spec pins that with pure-color images)
    * reduce to EXPLICIT integer luminance ⌊(2126·R + 7152·G + 722·B)
    * / 10000⌋ (the BT.709 weights, scaled integer, one floor
    * division) — never a silent band-0 read, which would fingerprint
    * the red channel of an RGB payload (the corrupt-media-discipline
    * inconsistency the round-11 review flagged); 2-band gray+alpha
    * reads the gray band. Returns the grid row-major, length 72. */
  def gridOf(img: BufferedImage): Array[Int] = {
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    require(w >= 1 && h >= 1, s"degenerate image ${w}x$h")
    val raster = img.getRaster
    val color = raster.getNumBands >= 3
    val fast = if (color) null else grayData(img)
    def grayOf(x: Int, y: Int): Long =
      if (color)
        (2126L * raster.getSample(x, y, 0) +
          7152L * raster.getSample(x, y, 1) +
          722L * raster.getSample(x, y, 2)) / 10000L
      else raster.getSample(x, y, 0).toLong
    val grid = new Array[Int](GridCols * GridRows)
    val area = w.toLong * h
    var cy = 0
    while (cy < GridRows) {
      val y0 = (cy.toLong * h / GridRows).toInt
      val y1 = (((cy + 1).toLong * h + GridRows - 1) / GridRows).toInt
      var cx = 0
      while (cx < GridCols) {
        val x0 = (cx.toLong * w / GridCols).toInt
        val x1 = (((cx + 1).toLong * w + GridCols - 1) / GridCols).toInt
        // the x-overlap weight depends on x alone — hoist it out of
        // the row loop (it was a min/max pair per PIXEL)
        val oxArr = new Array[Long](x1 - x0)
        var xi = x0
        while (xi < x1) {
          oxArr(xi - x0) =
            math.min((cx + 1).toLong * w, (xi + 1).toLong * GridCols) -
              math.max(cx.toLong * w, xi.toLong * GridCols)
          xi += 1
        }
        var s = 0L
        var y = y0
        while (y < y1) {
          val oy = math.min((cy + 1).toLong * h, (y + 1).toLong * GridRows) -
            math.max(cy.toLong * h, y.toLong * GridRows)
          if (fast != null) {
            val row = y * w
            var x = x0
            while (x < x1) {
              s += oxArr(x - x0) * oy * (fast(row + x) & 0xFF)
              x += 1
            }
          } else {
            var x = x0
            while (x < x1) {
              s += oxArr(x - x0) * oy * grayOf(x, y)
              x += 1
            }
          }
          y += 1
        }
        grid(cy * GridCols + cx) = (s / area).toInt
        cx += 1
      }
      cy += 1
    }
    grid
  }

  /** 64-bit dHash over the 9×8 grid: bit (cy·8 + cx) = 1 iff
    * grid(cy, cx+1) > grid(cy, cx) — pure integer comparisons, no
    * ties-to-even hazard anywhere. */
  def dHash64(grid: Array[Int]): Long = {
    require(grid.length == GridCols * GridRows)
    var fp = 0L
    var cy = 0
    while (cy < GridRows) {
      var cx = 0
      while (cx < GridCols - 1) {
        if (grid(cy * GridCols + cx + 1) > grid(cy * GridCols + cx))
          fp |= 1L << (cy * (GridCols - 1) + cx)
        cx += 1
      }
      cy += 1
    }
    fp
  }

  final case class PngRow(media_id: Long, payload: Array[Byte])
  final case class HashRow(media_id: Long, dhash: Long)

  /** The slim id column of a corpus frame, hash-spread to the
    * session's shuffle parallelism BEFORE the CPU-heavy per-id
    * synthesis the media builders do. Why: synthesis parallelism
    * must never be bound by the SOURCE's split count — the sf0.1
    * documents table is ONE parquet file (1 scan partition) and the
    * 25× fixture is 8, so without this cut the whole
    * render+encode(+decode downstream) chain of a 125k-image corpus
    * ran on 8 of 32 cores (the 25× stage table showed the synthesis
    * stage at 8 tasks × 52 s). Only 8-byte ids cross the exchange —
    * payloads are created AFTER it, so the media-plan audit's
    * payload-free-exchange rule is preserved by construction. The
    * partition count is explicit (not `repartition(col)`) because
    * an advisory repartition of a few MB of ids is exactly what AQE
    * would coalesce back to one partition. */
  private[ext] def spreadIds(spark: SparkSession, docs: DataFrame,
      idCol: String): Dataset[Long] = {
    import spark.implicits._
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    docs.select(col(idCol).cast("long")).as[Long]
      .repartition(n, col(idCol))
  }

  /** Materialize the synthetic PNG media frame for a corpus id
    * column: payload = real PNG bytes, metadata struct alongside
    * (the [[Multimodal.toMediaFrame]] layout with image geometry).
    * Encode streams per partition — no image ever exists on the
    * driver. */
  def syntheticPngFrame(spark: SparkSession, docs: DataFrame,
      idCol: String, w: Int = DefaultW, h: Int = DefaultH): DataFrame = {
    import spark.implicits._
    spreadIds(spark, docs, idCol)
      .mapPartitions { ids =>
        val codec = partitionCodec()
        ids.map(id => PngRow(id, codec.encode(renderPattern(id, w, h))))
      }
      .toDF()
      .select(col("media_id"), col("payload"),
        struct(lit("image").as("kind"),
          octet_length(col("payload")).as("n_bytes"),
          lit(w).as("width"), lit(h).as("height")).as("meta"))
  }

  /** The MIXED-GEOMETRY synthetic frame: every image gets its own
    * ([[varW]], [[varH]]) dimensions — mostly not divisible by the
    * 9×8 grid, so decoding exercises the rational resize on every
    * row. Same slim layout as [[syntheticPngFrame]]; dims ride the
    * metadata struct per row. */
  def syntheticPngFrameVarDims(spark: SparkSession, docs: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    spreadIds(spark, docs, idCol)
      .mapPartitions { ids =>
        val codec = partitionCodec()
        ids.map { id =>
          val pid = baseId(id)
          PngRow(id, codec.encode(renderPattern(id, varW(pid), varH(pid))))
        }
      }
      .toDF()
      .select(col("media_id"), col("payload"),
        struct(lit("image").as("kind"),
          octet_length(col("payload")).as("n_bytes")).as("meta"))
  }

  /** Decode + fingerprint a media frame: (media_id, dhash). One
    * decoder pass per partition, payload dropped immediately after
    * hashing — the output is 16 bytes/row whatever the image size.
    * Mixed PNG/JPEG corpora flow through the same call — the codec
    * sniffs per payload. */
  def dHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[PngRow]
      .mapPartitions { rows =>
        val codec = partitionCodec()
        rows.map(r =>
          HashRow(r.media_id, dHash64(gridOf(codec.decode(r.payload)))))
      }
      .toDF()
  }

  final case class DimRow(media_id: Long, width: Int, height: Int)

  /** DECODED image dimensions — read off the real raster, not off
    * metadata (the honest input for patch-token costing:
    * [[Packing.packMultimodal]] buys accelerator budget by what the
    * model will actually see). Streams per partition like
    * [[dHashes]]; output is 16 bytes/row. */
  def decodedMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[PngRow]
      .mapPartitions { rows =>
        val codec = partitionCodec()
        rows.map { r =>
          val img = codec.decode(r.payload)
          DimRow(r.media_id, img.getWidth, img.getHeight)
        }
      }
      .toDF()
  }

  /** End-to-end perceptual near-dup pairs over a corpus id column:
    * synthesize PNGs → decode → dHash → pigeonhole-banded Hamming
    * self-join. Returns (doc_a, doc_b, hamming ≤ maxDist) — the
    * exact pair surface the q231 oracle replays analytically. */
  def dHashNearDupPairs(spark: SparkSession, docs: DataFrame,
      idCol: String, maxDist: Int = 2, chunks: Int = 4): DataFrame = {
    val fps = dHashes(spark, syntheticPngFrame(spark, docs, idCol))
    Dedup.hammingPairsFromFingerprints(fps, "media_id", "dhash",
      maxDist, chunks, nBits = 64)
  }

  /** [[dHashNearDupPairs]] over the mixed-geometry corpus — every
    * image its own arbitrary (w, h), decoded through the rational
    * resize (q234's surface; the oracle replays the rational box
    * sums analytically). */
  def dHashNearDupPairsVarDims(spark: SparkSession, docs: DataFrame,
      idCol: String, maxDist: Int = 2, chunks: Int = 4): DataFrame = {
    val fps = dHashes(spark, syntheticPngFrameVarDims(spark, docs, idCol))
    Dedup.hammingPairsFromFingerprints(fps, "media_id", "dhash",
      maxDist, chunks, nBits = 64)
  }

  // ------------------------------------------------- mirror invariance

  /** The q244 fixture rule: every (40k+11)th image (k ≥ 1) is the
    * HORIZONTAL MIRROR of its predecessor's rendered image — the
    * mirrored-repost case a perceptual dedup pass must catch, which
    * plain dHash misses (mirroring permutes and partially complements
    * the gradient bits). */
  def isMirroredId(id: Long): Boolean = id > 10 && id % 40 == 11

  /** The horizontally-flipped grid (columns reversed). */
  def mirrorGrid(grid: Array[Int]): Array[Int] = {
    require(grid.length == GridCols * GridRows)
    Array.tabulate(grid.length) { k =>
      val cy = k / GridCols; val cx = k % GridCols
      grid(cy * GridCols + (GridCols - 1 - cx))
    }
  }

  private def renderWithMirrors(id: Long): BufferedImage =
    if (isMirroredId(id)) {
      val src = id - 1
      val pid = baseId(src)
      val pert = isPerturbed(src)
      val img = new BufferedImage(DefaultW, DefaultH,
        BufferedImage.TYPE_BYTE_GRAY)
      val data = grayData(img)
      if (data != null) {
        var y = 0
        while (y < DefaultH) {
          val row = y * DefaultW
          var x = 0
          while (x < DefaultW) {
            data(row + x) = grayAt(pid, pert, DefaultW - 1 - x, y).toByte
            x += 1
          }
          y += 1
        }
      } else {
        val raster = img.getRaster
        var y = 0
        while (y < DefaultH) {
          var x = 0
          while (x < DefaultW) {
            raster.setSample(x, y, 0,
              grayAt(pid, pert, DefaultW - 1 - x, y))
            x += 1
          }
          y += 1
        }
      }
      img
    } else renderPattern(id, DefaultW, DefaultH)

  /** The mirror-bearing synthetic frame (q244's corpus). */
  def syntheticPngFrameWithMirrors(spark: SparkSession, docs: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    spreadIds(spark, docs, idCol)
      .mapPartitions { ids =>
        val codec = partitionCodec()
        ids.map(id => PngRow(id, codec.encode(renderWithMirrors(id))))
      }
      .toDF()
  }

  /** Both orientations' fingerprints from ONE decode: each payload
    * contributes rows (media_id·2, dHash of the decoded grid) and
    * (media_id·2 + 1, dHash of its column-reversed twin — a 72-int
    * flip, never a second decode). The composite-id table is what
    * mirror-invariant dedup joins over — 32 bytes/image of state,
    * batch ([[dHashNearDupPairsMirrorAware]]) and streaming
    * ([[graft.streaming.MediaDedupMaintenance]]) paths share this
    * ONE definition so they cannot disagree on what a duplicate is
    * (the round-11 verdict's batch-vs-stream divergence). */
  def dHashesBothOrientations(spark: SparkSession,
      media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[PngRow]
      .mapPartitions { rows =>
        val codec = partitionCodec()
        rows.flatMap { r =>
          val grid = gridOf(codec.decode(r.payload))
          Seq(HashRow(r.media_id * 2, dHash64(grid)),
            HashRow(r.media_id * 2 + 1, dHash64(mirrorGrid(grid))))
        }
      }
      .toDF()
  }

  /** Collapse composite-id orientation pairs to media level with the
    * MINIMUM Hamming across the orientation combos (deterministic —
    * never an arbitrary surviving variant row); self-combos (an
    * image against its own mirror) are dropped. */
  def collapseOrientationPairs(pairs: DataFrame): DataFrame =
    pairs
      .select(expr("doc_a div 2").as("ma"),
        expr("doc_b div 2").as("mb"), col("hamming"))
      .filter(col("ma") =!= col("mb"))
      .groupBy(col("ma").as("doc_a"), col("mb").as("doc_b"))
      .agg(min(col("hamming")).cast("int").as("hamming"))

  /** MIRROR-INVARIANT near-dup pairs: every image contributes BOTH
    * orientations' dHashes ([[dHashesBothOrientations]]), the banded
    * join runs over composite (media, orientation) ids, and pairs
    * collapse to media level with the minimum Hamming
    * ([[collapseOrientationPairs]]). A mirrored repost then surfaces
    * at Hamming 0 through the (original, mirrored-fingerprint) combo
    * that plain dHash never sees. Fingerprint state doubles
    * (32 bytes/image); the join machinery and its pigeonhole
    * guarantee are unchanged. */
  def dHashNearDupPairsMirrorAware(spark: SparkSession, docs: DataFrame,
      idCol: String, maxDist: Int = 2, chunks: Int = 4): DataFrame = {
    val fps = dHashesBothOrientations(spark,
      syntheticPngFrameWithMirrors(spark, docs, idCol))
    collapseOrientationPairs(
      Dedup.hammingPairsFromFingerprints(fps, "media_id", "dhash",
        maxDist, chunks, nBits = 64))
  }
}
