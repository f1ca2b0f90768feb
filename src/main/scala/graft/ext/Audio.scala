package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** REAL audio decode for the multimodal column surface — the JDK's
  * built-in `javax.sound.sampled` WAV codec, no external dependency
  * (the FFmpeg caveat honestly covers only compressed CONTAINERS;
  * PCM WAV is pure JDK): opaque `binary` WAV payloads are decoded to
  * 16-bit signed PCM samples on the executor and reduced to INTEGRAL
  * features — sample count, Σ|s| (magnitude mass), Σs² (energy),
  * zero-crossing count — plus a 64-bit energy-gradient fingerprint
  * (65 contiguous sample bins, bin k = Σ|s| of samples with
  * ⌊i·65/n⌋ = k; bit k = 1 iff bin k+1 > bin k — the audio analogue
  * of the image dHash, pure integer comparisons). Near-duplicate
  * pairs ride the SAME pigeonhole-banded Hamming join as the image
  * and SimHash families ([[Dedup.hammingPairsFromFingerprints]]).
  *
  * Scale shape: payloads never touch the driver — encode and decode
  * both stream through `mapPartitions`, one clip in flight per row;
  * the corpus-wide state is the slim per-clip feature/fingerprint
  * table (≤ 56 bytes/row whatever the clip length); pairs come from
  * the banded join (zero false negatives for Hamming ≤ maxDist by
  * the pigeonhole principle).
  *
  * The synthetic signal behind the fixture WAVs is an integer
  * formula of (id, i) (SQL-replayable, the q231 discipline: the
  * q235/q236 oracles compute expected features/fingerprints
  * ANALYTICALLY while Spark runs the real encode→decode→feature
  * chain — a match proves the WAV codec path is lossless-correct,
  * which PCM is, not just plumbed). Duplicate structure mirrors the
  * image fixture: every 25th clip copies its predecessor exactly;
  * every 50k+7th copies it with the first 8 samples perturbed
  * (+128 inside the mod — a near-dup that can move only bin-0-edge
  * gradient bits). */
object Audio {

  /** Fingerprint geometry: 65 bins → 64 gradient bits. */
  val Bins = 65

  val SampleRate = 8000f

  /** Clip length in samples: 400..656, derived from the PATTERN id
    * (copies share their base's length — designed duplicates stay
    * sample-identical). Always > Bins, so every bin is non-empty. */
  def clipLen(pid: Long): Int = (400L + (pid * 11L) % 257L).toInt

  /** Synthetic 16-bit sample i of pattern `pid` — a pure integer
    * formula (Knuth-mix of pid, two mod forms in the index) that
    * DuckDB replays verbatim; the perturbation adds 128 (inside the
    * mod) to the first 8 samples. Range [-32768, 32767]. */
  def sampleAt(pid: Long, perturb: Boolean, i: Int): Short = {
    val m = (pid * 2654435761L) % 2147483647L
    val v = (m % 256L + 1L) * (5L * i + 7L) +
      ((m / 256L) % 256L) * ((i.toLong * i) % 1009L) +
      (if (perturb && i < 8) 128L else 0L)
    ((v % 65536L) - 32768L).toShort
  }

  private def renderClip(id: Long): Array[Short] = {
    val pid = Images.baseId(id)
    val pert = Images.isPerturbed(id)
    Array.tabulate(clipLen(pid))(i => sampleAt(pid, pert, i))
  }

  // The `AudioSystem.write` / `AudioSystem.getAudioInputStream`
  // convenience statics scan the SPI provider registry PER CALL —
  // the same disease `ImageIO.write` had for images (round-10's
  // PngCodec lesson), and the 25× audio probe measured it: 35× wall
  // at 25× clips while the registry-free image path stayed at 2.7×.
  // Resolve the WAV reader/writer ONCE per JVM; the JDK's
  // WaveFileReader/Writer are stateless, so one shared instance
  // serves all executor threads.
  private lazy val wavWriter: AudioFileWriter = {
    val it = java.util.ServiceLoader
      .load(classOf[AudioFileWriter]).iterator()
    var found: AudioFileWriter = null
    while (found == null && it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(AudioFileFormat.Type.WAVE)) found = w
    }
    require(found != null, "no WAVE AudioFileWriter provider in JVM")
    found
  }
  private lazy val wavReader: AudioFileReader = {
    val probe = { // a minimal WAV to identify the right reader once
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        SampleRate, 16, 1, 2, SampleRate, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(new Array[Byte](4)), fmt, 2L)
      val bos = new ByteArrayOutputStream()
      wavWriter.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val it = java.util.ServiceLoader
      .load(classOf[AudioFileReader]).iterator()
    var found: AudioFileReader = null
    while (found == null && it.hasNext) {
      val r = it.next()
      try {
        r.getAudioFileFormat(new ByteArrayInputStream(probe))
        found = r
      } catch { case _: Exception => }
    }
    require(found != null, "no WAVE AudioFileReader provider in JVM")
    found
  }

  /** REAL WAV encode via `javax.sound.sampled`: 16-bit signed
    * little-endian mono PCM wrapped in a RIFF/WAVE container by the
    * JDK's SPI writer — the actual codec, not a hand-rolled header;
    * resolved once per JVM, not per call. */
  def encodeWav(samples: Array[Short]): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      SampleRate, 16, 1, 2, SampleRate, false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    wavWriter.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL WAV decode via the JDK's SPI reader (resolved once per
    * JVM): parses the RIFF header, checks the format is 16-bit
    * signed mono PCM (loud on anything else — silent misreads are
    * how corrupt audio poisons a corpus), and returns the samples
    * honoring the container's declared endianness. */
  def decodeWav(wav: Array[Byte]): Array[Short] = {
    val ais = wavReader.getAudioInputStream(new ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
      s"unsupported audio format: $fmt (need 16-bit signed mono PCM)")
    val bytes = ais.readAllBytes()
    ais.close()
    // a truncated data section (odd byte count for 16-bit samples)
    // must be loud, not a silently dropped trailing byte
    require(bytes.length % 2 == 0,
      s"corrupt PCM data: odd byte count ${bytes.length} for 16-bit samples")
    val n = bytes.length / 2
    val out = new Array[Short](n)
    var i = 0
    if (fmt.isBigEndian)
      while (i < n) {
        out(i) = (((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
        i += 1
      }
    else
      while (i < n) {
        out(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
        i += 1
      }
    out
  }

  /** The 64-bit energy-gradient fingerprint over decoded samples:
    * bin k = Σ|s_i| over samples with ⌊i·Bins/n⌋ = k (integer
    * assignment — every sample lands in exactly one bin), bit k = 1
    * iff bin k+1 > bin k. */
  def fingerprint64(samples: Array[Short]): Long = {
    val n = samples.length
    require(n >= Bins, s"clip too short for $Bins bins: $n")
    val bins = new Array[Long](Bins)
    var i = 0
    while (i < n) {
      bins((i.toLong * Bins / n).toInt) += math.abs(samples(i).toLong)
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < Bins - 1) {
      if (bins(k + 1) > bins(k)) fp |= 1L << k
      k += 1
    }
    fp
  }

  final case class WavRow(media_id: Long, payload: Array[Byte])
  final case class AudioFeatures(media_id: Long, n_samples: Long,
      sum_abs: Long, sum_sq: Long, n_zero_cross: Long,
      fp_lo: Long, fp_hi: Long)

  /** Materialize the synthetic WAV media frame for a corpus id
    * column: payload = real RIFF/WAVE bytes. Encode streams per
    * partition — no clip ever exists on the driver. */
  def syntheticWavFrame(spark: SparkSession, docs: DataFrame,
      idCol: String): DataFrame = {
    import spark.implicits._
    Images.spreadIds(spark, docs, idCol)
      .mapPartitions(_.map(id => WavRow(id, encodeWav(renderClip(id)))))
      .toDF()
      .select(col("media_id"), col("payload"),
        struct(lit("audio").as("kind"),
          octet_length(col("payload")).as("n_bytes")).as("meta"))
  }

  /** Decode + featurize: one pass over the samples per clip, payload
    * dropped immediately after — output is ≤ 56 bytes/row whatever
    * the clip length. Zero crossing = adjacent samples on opposite
    * sides of zero (negative vs non-negative). The 64-bit
    * fingerprint ships split into two non-negative 32-bit words
    * (fp_lo/fp_hi) so the oracle never has to build a sign-bit
    * BIGINT with `1 << 63`. */
  def features(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[WavRow]
      .mapPartitions(_.map { r =>
        val s = decodeWav(r.payload)
        var sumAbs = 0L; var sumSq = 0L; var zc = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i).toLong
          sumAbs += math.abs(v); sumSq += v * v
          if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zc += 1
          i += 1
        }
        val fp = fingerprint64(s)
        AudioFeatures(r.media_id, s.length.toLong, sumAbs, sumSq, zc,
          fp & 0xffffffffL, fp >>> 32)
      })
      .toDF()
  }

  final case class PitchRow(media_id: Long, best_lag: Int, best_r: Long)

  /** Integer autocorrelation pitch estimate over decoded samples —
    * the classic time-domain period detector, kept EXACT: R(L) =
    * Σ s_i·s_{i+L} over the clip (pure Long arithmetic — spectral
    * methods need floating FFTs, autocorrelation does not), best lag
    * = argmax of R over [minLag, maxLag] with smallest-lag
    * tie-break, so any engine that can read the samples replays the
    * argmax bit for bit. One pass per clip per lag — O(n·lags),
    * map-only, no shuffle anywhere (the q235 plan discipline). */
  def autocorrPitch(spark: SparkSession, media: DataFrame,
      minLag: Int = 40, maxLag: Int = 72): DataFrame = {
    require(1 <= minLag && minLag <= maxLag)
    import spark.implicits._
    media.select(col("media_id"), col("payload")).as[WavRow]
      .mapPartitions(_.map { r =>
        val s = decodeWav(r.payload)
        // a lag with zero overlapping terms has no autocorrelation —
        // scoring it as R=0 would let a phantom out-of-range lag win
        // the argmax on short clips (and diverge from the oracle,
        // which has no row for an empty lag). Loud instead: pitch
        // over [minLag, maxLag] is undefined for clips this short.
        require(s.length > minLag,
          s"clip ${r.media_id}: ${s.length} samples too short for " +
            s"autocorrelation lag $minLag")
        var bestLag = minLag
        var bestR = Long.MinValue
        var lag = minLag
        while (lag <= maxLag) {
          val n = s.length - lag
          if (n > 0) {
            var acc = 0L
            var i = 0
            while (i < n) {
              acc += s(i).toLong * s(i + lag)
              i += 1
            }
            if (acc > bestR) { bestR = acc; bestLag = lag }
          }
          lag += 1
        }
        PitchRow(r.media_id, bestLag, bestR)
      })
      .toDF()
  }

  /** End-to-end perceptual near-dup pairs over a corpus id column:
    * synthesize WAVs → decode → fingerprint → pigeonhole-banded
    * Hamming self-join. Returns (doc_a, doc_b, hamming ≤ maxDist) —
    * the exact pair surface the q236 oracle replays analytically. */
  def fingerprintNearDupPairs(spark: SparkSession, docs: DataFrame,
      idCol: String, maxDist: Int = 2, chunks: Int = 4): DataFrame = {
    import spark.implicits._
    val fps = syntheticWavFrame(spark, docs, idCol)
      .select(col("media_id"), col("payload")).as[WavRow]
      .mapPartitions(_.map(r =>
        Images.HashRow(r.media_id, fingerprint64(decodeWav(r.payload)))))
      .toDF()
    Dedup.hammingPairsFromFingerprints(fps, "media_id", "dhash",
      maxDist, chunks, nBits = 64)
  }
}
