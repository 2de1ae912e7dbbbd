package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, batched decode / feature-extraction over partitions.
  *
  * Decode is REAL wherever the JDK ships a codec: images via
  * javax.imageio (PNG, JPEG, BMP, GIF — [[decodeImageStats]],
  * [[resizeImageStats]], [[imageDHash]]), audio via javax.sound (WAV
  * PCM — [[decodeAudioStats]], [[audioFingerprint]]), and multi-frame
  * GIF as the video stand-in ([[sampleFrameStats]]). Every decode gate
  * proves the round trip end-to-end: deterministic payloads encoded
  * with the same JDK codecs (all lossless for the fixture content),
  * decoded distributed, features checked against the oracle's closed
  * form. Only exotic video codecs stay behind `decodeStub` — the
  * binary layout, metadata struct and per-partition batched shape are
  * the contract a real codec plugs into.
  */
object Multimodal {

  // ImageIO defaults to FILE-backed stream caches: every encode/decode
  // call creates (and deletes) a temp file. For per-row KB-sized
  // payloads the memory cache is strictly better — this one switch cut
  // the 1M-image x200 bulk gate from 171 s to 7.9 s (21x). Object
  // initialization runs once per JVM before any decoder touches ImageIO.
  javax.imageio.ImageIO.setUseCache(false)

  /** Pack a text corpus as (id, bytes, meta) — the opaque-binary media
    * layout. `meta` is the typed sidecar a real pipeline would carry
    * (dimensions, format, source). */
  def packBinary(df: DataFrame, id: Column, payload: Column, format: String): DataFrame =
    df.select(
      id.as("media_id"),
      encode(payload, "UTF-8").as("bytes"),
      struct(
        octet_length(payload).as("byte_len"),
        lit(format).as("format")).as("meta"))

  /** STUB — deterministic fake media decode: first `dim` bytes scaled to
    * [0,1]. A real implementation would decode the codec here; the
    * signature (bytes -> fixed-dim float features) is the contract. */
  def decodeStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim && i < bytes.length) {
      out(i) = (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batched per-partition decode — the Scala analog of a vectorized
    * (mapInPandas-style) decode UDF: one JVM call per partition, the
    * stub applied per row inside. Input df must have (media_id: long,
    * bytes: binary); output adds `features: array<float>`. */
  def decodeFeatures(spark: SparkSession, df: DataFrame, dim: Int = 8): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      df.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
    ds.mapPartitions(_.map { case (id, bytes) => (id, decodeStub(bytes, dim)) })
      .toDF("media_id", "features")
  }

  /** Deterministic synthetic RGB image for a seed id: pixel (x, y) gets
    * r = (id*7 + x*3 + y*5) % 256, g = (id*11 + x) % 256,
    * b = (id*13 + y) % 256 — a closed form any engine can re-derive,
    * which is what makes the decode gate oracle-checkable. Encoded as
    * PNG (lossless) with the JDK's own codec. */
  def synthImagePng(id: Long, w: Int = 8, h: Int = 8): Array[Byte] =
    renderPng(w, h) { (x, y) =>
      val r = ((id * 7 + x * 3 + y * 5) % 256).toInt
      val g = ((id * 11 + x) % 256).toInt
      val b = ((id * 13 + y) % 256).toInt
      (r << 16) | (g << 8) | b
    }

  /** Render an (x, y) -> packed-RGB function as PNG bytes — the shared
    * encode tail of every synthetic image generator (PNG is lossless,
    * which is what keeps the decode gates closed-form-checkable). */
  private def renderPng(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** The fixture-series polynomial shared by the image and audio
    * generators (mirrored term-for-term by their oracles). Each
    * generator reduces it double-mod — first by a PRIME, then by its
    * value range — because the prime reduction breaks the
    * arithmetic-progression / sawtooth structure a single power-of-two
    * mod would keep: with a plain mod, adjacent-sample comparisons
    * barely depend on the seed and every group's fingerprint collided. */
  private def seriesPoly(s: Long, i: Long, c: Long): Long =
    i * i * (s + 7) + i * (s * s + 13) + c

  /** The (media_id, bytes) projection every batched decoder starts
    * from — one place, so the decoders cannot drift on it. */
  private def binaryDs(spark: SparkSession, df: DataFrame): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    df.select(col("media_id"), col("bytes")).as[(Long, Array[Byte])]
  }

  /** Decode guard shared by every media decoder: a NULL payload or ANY
    * decoder failure yields None (→ the marker row), never a task
    * failure. Catching NonFatal, not just IOException, is load-bearing:
    * the JDK codecs throw RuntimeExceptions (AIOOBE,
    * NegativeArraySizeException, IllegalArgumentException) on truncated
    * or crafted payloads. */
  private def tryDecode[A](bytes: Array[Byte])(f: Array[Byte] => A): Option[A] =
    if (bytes == null) None
    else try Option(f(bytes)) catch { case scala.util.control.NonFatal(_) => None }

  /** Exact per-channel pixel sums of a decoded image. */
  private def channelSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xff
        sg += (p >> 8) & 0xff
        sb += p & 0xff
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  /** REAL batched image decode over a (media_id: long, bytes: binary)
    * frame: javax.imageio decodes each payload inside one
    * per-partition JVM call (the mapInPandas-style batch shape) and
    * emits dimensions + exact per-channel pixel sums — the
    * decode-then-featurize step of an image-corpus pipeline. Unreadable
    * payloads yield a (-1, -1, 0, 0, 0) row rather than failing the
    * batch (corrupt-media-skip semantics). */
  def decodeImageStats(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    binaryDs(spark, df).mapPartitions(_.map { case (id, bytes) =>
      tryDecode(bytes)(b =>
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))) match {
        case None => (id, -1, -1, 0L, 0L, 0L)
        case Some(img) =>
          val (sr, sg, sb) = channelSums(img)
          (id, img.getWidth, img.getHeight, sr, sg, sb)
      }
    }).toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** Nearest-neighbor image resize + channel stats in one decode pass:
    * output pixel (x, y) samples source pixel (x*sw/tw, y*sh/th) — the
    * standard thumbnail/downsample step, chosen over interpolating
    * kernels because its arithmetic is exact (integer source indexing,
    * no blending), so the gate can check resized channel sums against a
    * closed form. Emits (media_id, width, height, sum_r, sum_g, sum_b)
    * of the RESIZED image; unreadable payloads yield the marker row. */
  def resizeImageStats(spark: SparkSession, df: DataFrame, tw: Int, th: Int): DataFrame = {
    import spark.implicits._
    binaryDs(spark, df).mapPartitions(_.map { case (id, bytes) =>
      tryDecode(bytes)(b =>
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))) match {
        case None => (id, -1, -1, 0L, 0L, 0L)
        case Some(img) =>
          val (sw, sh) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < th) {
            var x = 0
            while (x < tw) {
              // long arithmetic: x*sw wraps Int for gigapixel-wide strips
              val p = img.getRGB((x.toLong * sw / tw).toInt, (y.toLong * sh / th).toInt)
              sr += (p >> 16) & 0xff
              sg += (p >> 8) & 0xff
              sb += p & 0xff
              x += 1
            }
            y += 1
          }
          (id, tw, th, sr, sg, sb)
      }
    }).toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** Deterministic 16-bit PCM mono WAV for a seed id: sample i =
    * ((id * 31 + i * 7) % 65536) - 32768 — closed-form, and WAV PCM is
    * lossless, so decoded samples equal generated ones exactly. Encoded
    * with the JDK's own codec (javax.sound.sampled). */
  def synthWav(id: Long, samples: Int = 256, sampleRate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](samples * 2)
    var i = 0
    while (i < samples) {
      val v = (((id * 31 + i * 7) % 65536) - 32768).toInt
      pcm(i * 2) = (v & 0xff).toByte // little-endian 16-bit
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    encodeWav(pcm, samples, sampleRate)
  }

  /** Shared PCM decode guard for every audio featurizer: decode to
    * MONO SIGNED 16-bit LITTLE-ENDIAN samples or None. The JDK also
    * opens AIFF/AU (big-endian), 8-bit/u-law and multi-channel
    * payloads — big-endian would byte-swap into silent garbage and
    * interleaved stereo would frame-misalign any time-window feature —
    * so every non-conforming clip gets the marker/NULL, never wrong
    * features. One place, so the decoders cannot drift on the guard. */
  private def decodePcm16Mono(bytes: Array[Byte]): Option[Array[Short]] =
    tryDecode(bytes) { b =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
          fmt.getChannels != 1 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          null
        else {
          val data = ais.readAllBytes()
          val out = new Array[Short](data.length / 2)
          var i = 0
          while (i < out.length) {
            out(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
            i += 1
          }
          out
        }
      } finally ais.close()
    }

  /** REAL batched audio decode (javax.sound.sampled — WAV/PCM ships
    * with the JDK): per-partition decode to 16-bit samples, emitting
    * (n_samples, sum, sum_abs) — the length/energy features an audio
    * curation pipeline filters on. Unreadable or non-conforming
    * payloads (see [[decodePcm16Mono]]) yield (-1, 0, 0). */
  def decodeAudioStats(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    binaryDs(spark, df).mapPartitions(_.map { case (id, bytes) =>
      decodePcm16Mono(bytes) match {
        case None => (id, -1L, 0L, 0L)
        case Some(samples) =>
          var (sum, sumAbs) = (0L, 0L)
          var i = 0
          while (i < samples.length) {
            sum += samples(i)
            sumAbs += math.abs(samples(i).toLong)
            i += 1
          }
          (id, samples.length.toLong, sum, sumAbs)
      }
    }).toDF("media_id", "n_samples", "sum_val", "sum_abs")
  }

  /** Deterministic 16-bit PCM mono WAV SERIES for audio-fingerprint
    * dedup fixtures — the audio analog of [[synthImageSeries]]: clips
    * come in groups of 4 (seed s = id/4) whose members differ only in
    * sample 0 (tweak (id%4)·977), and sample i's value is
    * `(((i²(s+7) + i(s²+13) + tweak₀) mod 65543) mod 65536) − 32768` —
    * the double-mod (65543 prime) breaks the sawtooth structure a
    * single mod would keep, which made every seed's energy profile
    * collide. */
  def synthWavSeries(id: Long, samples: Int = 256, sampleRate: Float = 8000f): Array[Byte] = {
    val s = id >> 2
    val tweak = (id & 3) * 977
    val pcm = new Array[Byte](samples * 2)
    var i = 0
    while (i < samples) {
      val c = if (i == 0) tweak else 0L
      val v = (seriesPoly(s, i.toLong, c) % 65543 % 65536 - 32768).toInt
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    encodeWav(pcm, samples, sampleRate)
  }

  /** PCM little-endian 16-bit mono -> WAV bytes via the JDK codec —
    * the shared encode tail of both synthetic WAV generators. */
  private def encodeWav(pcm: Array[Byte], samples: Int, sampleRate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** (windows−1)-bit energy-profile fingerprint per audio clip — the
    * chromaprint-shaped perceptual hash for audio near-dup: decode to
    * 16-bit samples, sum |v| over `windows` equal time windows (window
    * w covers samples [w·n/windows, (w+1)·n/windows), integer
    * boundaries), bit w set when energy(w+1) > energy(w). Exact integer
    * arithmetic end-to-end, so the oracle re-derives fingerprints from
    * the sample closed form. Clips that fail to decode, are not 16-bit
    * little-endian signed PCM, or have fewer samples than windows yield
    * a NULL fingerprint. */
  def audioFingerprint(spark: SparkSession, df: DataFrame,
      windows: Int = 64): DataFrame = {
    require(windows > 1 && windows <= 65,
      s"audioFingerprint: windows must be in 2..65 (fingerprint fits a long), got $windows")
    import spark.implicits._
    binaryDs(spark, df).mapPartitions(_.map { case (id, bytes) =>
      val fp = decodePcm16Mono(bytes).filter(_.length >= windows).map { samples =>
        val n = samples.length
        val energy = new Array[Long](windows)
        var w = 0
        while (w < windows) {
          val start = (w.toLong * n / windows).toInt
          val end = ((w + 1).toLong * n / windows).toInt
          var e = 0L
          var i = start
          while (i < end) {
            e += math.abs(samples(i).toLong)
            i += 1
          }
          energy(w) = e
          w += 1
        }
        var bits = 0L
        var j = 0
        while (j < windows - 1) {
          if (energy(j + 1) > energy(j)) bits |= 1L << j
          j += 1
        }
        bits
      }
      (id, fp)
    }).toDF("media_id", "afp")
  }

  /** Audio near-duplicate pairs by energy-profile fingerprint:
    * [[audioFingerprint]]s within `maxHamming` bits via the generic
    * banded-Hamming machinery (exact recall by pigeonhole). Returns
    * (media_a, media_b, hamming). */
  def audioNearDupPairs(spark: SparkSession, df: DataFrame,
      maxHamming: Int = 2, windows: Int = 64,
      maxBucket: Int = NearDup.DefaultMaxBucket): DataFrame =
    NearDup.hammingNearDups(
      audioFingerprint(spark, df, windows)
        .filter(col("afp").isNotNull)
        .select(col("media_id").as("doc_id"), col("afp").as("fp")),
      bits = windows - 1, maxHamming = maxHamming, maxBucket = maxBucket)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"), col("hamming"))

  /** Deterministic multi-frame GIF (the JDK's only multi-frame codec —
    * the video stand-in): frame f's pixel (x, y) gets
    * r = (id*7 + f*17 + x*3 + y*5) % 256, g = (id*11 + f*19 + x) % 256,
    * b = (id*13 + f*23 + y) % 256. An 8x8 frame holds at most 64
    * distinct colors, far under GIF's 256-color palette, so the encode
    * is lossless and frame sums gate against the closed form. */
  def synthGif(id: Long, frames: Int = 6, w: Int = 8, h: Int = 8): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < frames) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((id * 7 + f * 17 + x * 3 + y * 5) % 256).toInt
          val g = ((id * 11 + f * 19 + x) % 256).toInt
          val b = ((id * 13 + f * 23 + y) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() } // file-cache-backed: leaks a temp file otherwise
    out.toByteArray
  }

  /** REAL frame sampling over a multi-frame payload (every `stride`-th
    * frame of a GIF — the video frame-sampling shape over the one
    * multi-frame codec the JDK ships): one row per SAMPLED frame with
    * exact channel sums. Decoding only touches the sampled frames.
    * Unreadable payloads yield a single (-1, 0, 0, 0) marker row. */
  def sampleFrameStats(spark: SparkSession, df: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    binaryDs(spark, df).mapPartitions(_.flatMap { case (id, bytes) =>
      tryDecode(bytes) { b =>
        // the default ImageInputStream is FILE-cache-backed: close it
        // (and dispose the reader) on every path or each row leaks a
        // temp file + descriptor until GC
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(b))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) null
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              (0 until n by stride).map { f =>
                val (sr, sg, sb) = channelSums(reader.read(f))
                (id, f.toLong, sr, sg, sb)
              }
            } finally reader.dispose()
          }
        } finally iis.close()
      }.getOrElse(Seq((id, -1L, 0L, 0L, 0L)))
    }).toDF("media_id", "frame_idx", "sum_r", "sum_g", "sum_b")
  }

  /** Deterministic synthetic 9x8 RGB image SERIES for perceptual-hash
    * dedup fixtures: images come in groups of 4 (seed s = id/4) whose
    * members differ only in one corner pixel (tweak = (id%4)*8 added to
    * pixel (0,0)'s base value) — exact and 1-bit-near duplicates inside
    * a group, unrelated across groups. The base value of pixel index
    * i = y*w+x+1 is `((i²(s+7) + i(s²+13)) mod 1009) mod 256` — the
    * double-mod breaks the arithmetic-progression structure a plain
    * mod-256 pattern would have (adjacent-pixel comparisons of an AP
    * are nearly seed-independent, which made every group collide).
    * Channels: r = v, g = (v+85) mod 256, b = (v+170) mod 256. PNG
    * (lossless) via the JDK codec, so decode reproduces the closed form
    * exactly — the oracle re-derives the dHash from the formula. */
  def synthImageSeries(id: Long, w: Int = 9, h: Int = 8): Array[Byte] = {
    val sd = id >> 2
    val tweak = (id & 3) * 8
    renderPng(w, h) { (x, y) =>
      val i = y.toLong * w + x + 1
      val c = if (x == 0 && y == 0) tweak else 0L
      // the tweak is added AFTER the mod-1009 reduction (matching the
      // oracle); the audio series folds it in before both reductions
      val v = ((seriesPoly(sd, i, 0L) % 1009 + c) % 256).toInt
      (v << 16) | (((v + 85) % 256) << 8) | ((v + 170) % 256)
    }
  }

  /** 64-bit difference hash (dHash) of each image — the standard
    * perceptual fingerprint for image near-dup: nearest-neighbor
    * resample to a (gw x gh) grid (integer source indexing, same
    * convention as [[resizeImageStats]] — identity when the image is
    * already gw x gh), integer luma per cell
    * (gray = 299·r + 587·g + 114·b, kept in milli-units — no division,
    * no rounding), bit y·(gw−1)+x set when gray(x+1,y) > gray(x,y).
    * Requires (gw−1)·gh ≤ 64 so the fingerprint fits one long.
    * Unreadable payloads yield a NULL dhash. */
  def imageDHash(spark: SparkSession, df: DataFrame,
      gw: Int = 9, gh: Int = 8): DataFrame = {
    require((gw - 1) * gh > 0 && (gw - 1) * gh <= 64,
      s"imageDHash: (gw-1)*gh must be in 1..64, got ${(gw - 1) * gh}")
    import spark.implicits._
    binaryDs(spark, df).mapPartitions(_.map { case (id, bytes) =>
      val dh = tryDecode(bytes)(b =>
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))).map { img =>
        val (sw, sh) = (img.getWidth, img.getHeight)
        val gray = new Array[Int](gw * gh)
        var y = 0
        while (y < gh) {
          var x = 0
          while (x < gw) {
            val p = img.getRGB((x.toLong * sw / gw).toInt, (y.toLong * sh / gh).toInt)
            gray(y * gw + x) =
              299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) + 114 * (p & 0xff)
            x += 1
          }
          y += 1
        }
        var bits = 0L
        var i = 0
        while (i < gh) {
          var j = 0
          while (j < gw - 1) {
            if (gray(i * gw + j + 1) > gray(i * gw + j))
              bits |= 1L << (i * (gw - 1) + j)
            j += 1
          }
          i += 1
        }
        bits
      }
      (id, dh)
    }).toDF("media_id", "dhash")
  }

  /** Image near-duplicate pairs by perceptual hash: [[imageDHash]]
    * fingerprints within `maxHamming` bits, paired by the generic
    * banded-bucket machinery ([[NearDup.hammingNearDups]] — exact
    * recall by pigeonhole, bucket-local candidate generation, one
    * bit_count(xor) verify). The decode is one narrow mapPartitions
    * pass; everything downstream shuffles 16-byte (id, fp) rows only.
    * Returns (media_a, media_b, hamming). */
  def imageNearDupPairs(spark: SparkSession, df: DataFrame,
      maxHamming: Int = 2, gw: Int = 9, gh: Int = 8,
      maxBucket: Int = NearDup.DefaultMaxBucket): DataFrame =
    NearDup.hammingNearDups(
      imageDHash(spark, df, gw, gh)
        .filter(col("dhash").isNotNull)
        .select(col("media_id").as("doc_id"), col("dhash").as("fp")),
      bits = (gw - 1) * gh, maxHamming = maxHamming, maxBucket = maxBucket)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"), col("hamming"))

  /** Expression-only feature extraction (for engine-level tests/oracles):
    * decodeStub's leading-byte semantics for UTF-8 ASCII payloads —
    * characters' byte values scaled to [0,1] — EXCEPT that payloads
    * shorter than `dim` yield a short array (no zero-padding; pad with
    * concat+array_repeat if a fixed width is required). Codegen'd, no
    * UDF. */
  def asciiFeatures(payload: Column, dim: Int = 8): Column =
    transform(graft.functions.TextFunctions.chars(substring(payload, 1, dim)),
      c => ascii(c) / 255.0)

  /** Frame-sampling analog: take every `stride`-th byte position (as a
    * character index for UTF-8 payloads) — the shape of video
    * frame-sampling over an opaque byte stream. */
  def sampleStride(payload: Column, stride: Int): Column =
    // empty payloads must yield an empty array: sequence(1, 0, stride)
    // has illegal boundaries and would fail the whole query
    when(length(payload) > 0,
      transform(
        sequence(lit(1), length(payload), lit(stride)),
        i => ascii(payload.substr(i, lit(1)))))
      .otherwise(array().cast("array<int>"))
}
