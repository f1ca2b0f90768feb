package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL image decode for the multimodal column surface — the JDK's
  * built-in `javax.imageio` PNG codec, no external dependency: opaque
  * `binary` PNG payloads are decoded to an 8-bit grayscale raster on
  * the executor, area-averaged to the classic 9×8 dHash grid with
  * EXACT integer arithmetic (sum of the cell's pixels, floor-divided
  * — no float resampling, so any engine that can read the pixels
  * replays the grid bit for bit), and fingerprinted with the 64-bit
  * difference hash (Krawetz's dHash: bit (row, col) = 1 iff the cell
  * right of (row, col) is brighter). Near-duplicate pairs then ride
  * the SAME pigeonhole-banded Hamming join the text SimHash family
  * uses ([[Dedup.hammingPairsFromFingerprints]]) — this replaces the
  * hex-shingle stand-in ([[Multimodal.payloadNearDupPairs]], kept as
  * the fallback for payloads with no registered decoder).
  *
  * Scale shape: payloads never touch the driver — encode and decode
  * both stream through `mapPartitions` (one codec instance per
  * partition, one image in flight per row); the corpus-wide state is
  * the slim (media_id, 64-bit fingerprint) table; pairs come from the
  * banded join (zero false negatives for Hamming ≤ maxDist by the
  * pigeonhole principle, exactly as q137 pins for SimHash).
  *
  * The synthetic pattern behind the test fixture's PNGs is an integer
  * formula of (id, x, y) (SQL-replayable, so the q231 oracle computes
  * the expected dHash ANALYTICALLY while Spark goes through the real
  * encode→decode→resize→hash chain — a hash match proves the whole
  * codec path is lossless-correct, not just plumbed). Every 25th
  * image is an exact copy of its predecessor (Hamming 0) and every
  * 50th-plus-7 a perturbed copy (first pixel column +16 gray —
  * a near-dup that flips only gradient bits on the grid's left
  * edge). */
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
    * integer formula (Knuth-mix of pid, then two mod-256 linear
    * forms in the coordinates) that DuckDB replays verbatim; the
    * perturbation brightens the first pixel column by 16. */
  def grayAt(pid: Long, perturb: Boolean, x: Int, y: Int): Int = {
    val m = (pid * 2654435761L) % 2147483647L
    val v = (m % 256L + 1L) * (7L * x + 13L * y + 1L) +
      ((m / 256L) % 256L) * (x.toLong * x + 11L * y + 3L) +
      (if (perturb && x == 0) 16L else 0L)
    (v % 256L).toInt
  }

  // In-memory stream cache: ImageIO's default spills every encode /
  // decode through a temp FILE — at corpus scale that is an fsync per
  // image. Process-wide, set once.
  ImageIO.setUseCache(false)

  /** One REUSABLE PNG codec per partition — `ImageIO.write`/`read`
    * convenience methods scan the service registry per CALL; a
    * million-image partition pays that a million times. This is the
    * "one decoder instance per partition" discipline the multimodal
    * scaladoc promises, made literal. Not thread-safe; one instance
    * per `mapPartitions` closure. */
  final class PngCodec {
    private val writer = ImageIO.getImageWritersByFormatName("png").next()
    private val reader = ImageIO.getImageReadersByFormatName("png").next()

    def encode(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = ImageIO.createImageOutputStream(bos)
      writer.setOutput(out)
      writer.write(img)
      out.close()
      bos.toByteArray
    }

    def decode(png: Array[Byte]): BufferedImage = {
      val in = ImageIO.createImageInputStream(new ByteArrayInputStream(png))
      reader.setInput(in)
      val img = reader.read(0)
      in.close()
      img
    }
  }

  private def renderPattern(id: Long, w: Int, h: Int): BufferedImage = {
    val pid = baseId(id)
    val pert = isPerturbed(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
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
    img
  }

  /** REAL PNG encode via `javax.imageio` (lossless 8-bit grayscale). */
  def encodePng(id: Long, w: Int = DefaultW, h: Int = DefaultH): Array[Byte] =
    new PngCodec().encode(renderPattern(id, w, h))

  /** REAL PNG decode + exact area-average resize to the
    * `GridCols`×`GridRows` dHash grid: cell (cx, cy) =
    * floor(sum of its (w/9)×(h/8) pixel block / block size). Reads
    * samples off the raster (never `getRGB` — that would route
    * through sRGB conversion and un-pin the values). Returns the
    * grid row-major, length 72. */
  def decodeGrayGrid(png: Array[Byte]): Array[Int] =
    gridOf(new PngCodec().decode(png))

  /** The area-average grid over an already-decoded raster. */
  def gridOf(img: BufferedImage): Array[Int] = {
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    require(w % GridCols == 0 && h % GridRows == 0,
      s"image ${w}x$h not divisible into the ${GridCols}x$GridRows grid")
    val bw = w / GridCols
    val bh = h / GridRows
    val raster = img.getRaster
    val grid = new Array[Int](GridCols * GridRows)
    var cy = 0
    while (cy < GridRows) {
      var cx = 0
      while (cx < GridCols) {
        var s = 0L
        var dy = 0
        while (dy < bh) {
          var dx = 0
          while (dx < bw) {
            s += raster.getSample(cx * bw + dx, cy * bh + dy, 0)
            dx += 1
          }
          dy += 1
        }
        grid(cy * GridCols + cx) = (s / (bw.toLong * bh)).toInt
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

  /** Materialize the synthetic PNG media frame for a corpus id
    * column: payload = real PNG bytes, metadata struct alongside
    * (the [[Multimodal.toMediaFrame]] layout with image geometry).
    * Encode streams per partition — no image ever exists on the
    * driver. */
  def syntheticPngFrame(spark: SparkSession, docs: DataFrame,
      idCol: String, w: Int = DefaultW, h: Int = DefaultH): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        val codec = new PngCodec()
        ids.map(id => PngRow(id, codec.encode(renderPattern(id, w, h))))
      }
      .toDF()
      .select(col("media_id"), col("payload"),
        struct(lit("image").as("kind"),
          octet_length(col("payload")).as("n_bytes"),
          lit(w).as("width"), lit(h).as("height")).as("meta"))
  }

  /** Decode + fingerprint a media frame: (media_id, dhash). One
    * decoder pass per partition, payload dropped immediately after
    * hashing — the output is 16 bytes/row whatever the image size. */
  def dHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[PngRow]
      .mapPartitions { rows =>
        val codec = new PngCodec()
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
        val codec = new PngCodec()
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
}
