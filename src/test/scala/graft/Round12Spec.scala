package graft

import java.awt.image.BufferedImage

import graft.ext.Images

/** Round-12: the explicit color-raster luminance rule, the shared
  * fragment-commit helper, and the capped cross-modal audit's
  * containment guarantees. */
class Round12Spec extends SparkSpec {

  test("gridOf: color rasters reduce to explicit integer BT.709 " +
      "luminance (bands are R,G,B for the JDK codecs), never a " +
      "silent red-channel read") {
    val codec = new Images.MediaCodec()
    try {
      // pure-color constant images pin the band order: a band-0 read
      // would see red=200 for the red image AND 0 for the green one;
      // the luminance rule sees 2126*200/10000=42 vs 7152*200/10000=143
      def solid(r: Int, g: Int, b: Int): BufferedImage = {
        val img = new BufferedImage(18, 16, BufferedImage.TYPE_3BYTE_BGR)
        for (y <- 0 until 16; x <- 0 until 18)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
        img
      }
      def gridVia(img: BufferedImage): Array[Int] =
        Images.gridOf(codec.decode(codec.encode(img)))
      assert(gridVia(solid(200, 0, 0)).forall(_ == 2126 * 200 / 10000),
        "red-only image must read as its BT.709 luminance (42)")
      assert(gridVia(solid(0, 200, 0)).forall(_ == 7152 * 200 / 10000),
        "green-only image must read as its BT.709 luminance (143)")
      assert(gridVia(solid(0, 0, 200)).forall(_ == 722 * 200 / 10000),
        "blue-only image must read as its BT.709 luminance (14)")
      // a gray color image (R=G=B) must land exactly where the
      // 1-band grayscale raster of the same values lands: the
      // weights sum to 10000, so luminance(v,v,v) = v
      val v = 123
      assert(gridVia(solid(v, v, v)).forall(_ == v))
    } finally codec.dispose()
  }

  test("committedBatchDirs: one shared rule — skips non-numeric " +
      "names, honors upToBatch, and sees nothing before the dir " +
      "exists") {
    val dir = tmpDir("commits")
    import graft.streaming.Commits
    assert(Commits.committedBatchDirs(spark, s"$dir/nope").isEmpty)
    val p = java.nio.file.Paths.get(dir)
    for (b <- 0 to 2) {
      val d = p.resolve(s"batch=$b")
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve("_SUCCESS"), Array.empty[Byte])
      java.nio.file.Files.write(d.resolve("part-000.parquet"),
        Array[Byte](1))
    }
    java.nio.file.Files.createDirectories(p.resolve("batch=oops"))
    java.nio.file.Files.createDirectories(p.resolve("_spark_metadata"))
    val all = Commits.committedBatchDirs(spark, dir)
    assert(all.map(_.getName).sorted == Seq("batch=0", "batch=1", "batch=2"))
    val upTo = Commits.committedBatchDirs(spark, dir, upToBatch = Some(1L))
    assert(upTo.map(_.getName).sorted == Seq("batch=0", "batch=1"))
  }
}
