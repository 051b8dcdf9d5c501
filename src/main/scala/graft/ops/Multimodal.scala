package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns: media as opaque `binary` with typed metadata.
 *
 * The Spark-side plumbing is real — schema, partition-parallel batch
 * decode via mapPartitions, typed output. All three modalities do
 * real header work: PNG/JPEG/GIF/BMP pixel dimensions
 * ([[ImageHeader]]), WAV sample rate / channels / sample count and
 * AVI dimensions / frame count ([[AvHeader]]) — pure JVM, no native
 * codec needed. Only pixel/sample CONTENT decode remains out of reach
 * in a codec-less container: `decodeStub` covers unrecognized
 * formats, and a real decoder (FFmpeg/Pillow worker) slots into the
 * same `mapPartitions` body without touching partitioning or schema.
 */
object Multimodal {

  /** media row: (id, kind, blob, meta json) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("blob", BinaryType, nullable = false),
    StructField("meta", StringType, nullable = true)))

  /**
   * Build a synthetic media table from documents. Image rows get a
   * REAL (minimal) PNG whose IHDR dimensions derive from the text's
   * md5 bytes — so the decode stage must actually parse the format to
   * recover them; audio/video rows carry the raw 16 md5 bytes as an
   * opaque payload. (The PNG wrapper runs in a scalar UDF: this is a
   * fixture builder, not a query hot path.)
   */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pngOf = udf { (digest: Array[Byte]) =>
      ImageHeader.pngBytes((digest(0) & 0xFF) % 64 + 1, (digest(1) & 0xFF) % 64 + 1)
    }
    docs.select(col(idCol).as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
        unhex(md5(col(textCol))).as("digest"),
        to_json(struct(col(idCol).as("src_doc"))).as("meta"))
      .withColumn("blob",
        when(col("kind") === "image", pngOf(col("digest"))).otherwise(col("digest")))
      .select("media_id", "kind", "blob", "meta")
  }

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 head_byte: Int, width: Int, height: Int,
                                 sum_bytes: Long)

  /** Decode one media row: images get their REAL dimensions parsed
    * from the format header; other kinds fall back to the stub. */
  def decode(id: Long, kind: String, blob: Array[Byte]): MediaFeatures =
    ImageHeader.parse(blob) match {
      case Some((w, h)) =>
        MediaFeatures(id, kind, blob.length, blob(0) & 0xFF, w, h, byteSum(blob))
      case None => decodeStub(id, kind, blob)
    }

  /**
   * STUB decoder for the codec-less kinds (audio/video frame
   * extraction needs libraries this container lacks). Deterministic
   * features from the payload bytes; real decoders slot in here
   * without touching the partitioning or schema.
   */
  def decodeStub(id: Long, kind: String, blob: Array[Byte]): MediaFeatures =
    MediaFeatures(id, kind, blob.length,
      head_byte = blob(0) & 0xFF,
      width = (blob(0) & 0xFF) % 64 + 1,
      height = (blob(1) & 0xFF) % 64 + 1,
      sum_bytes = byteSum(blob))

  private def byteSum(blob: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < blob.length) { sum += blob(i) & 0xFF; i += 1 }
    sum
  }

  /**
   * Partition-parallel batch feature extraction over a media table.
   * One decoder instance per partition (mirrors batching a real codec
   * or model would need); rows stream through without accumulation.
   */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "blob").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup for a real decoder would happen here
        it.map { case (id, kind, blob) => decode(id, kind, blob) }
      }
  }

  /**
   * Synthetic media table where EVERY kind is a real container: image
   * rows a minimal PNG, audio rows a playable 16-bit PCM WAV, video
   * rows a minimal AVI with a real `avih` header — all parameters
   * derived from the text's md5 bytes, so decode must genuinely parse
   * each format to recover them. (Scalar UDFs: fixture builder only.)
   */
  def syntheticAvMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val blobOf = udf { (kind: String, d: Array[Byte]) =>
      val (b0, b1, b2) = (d(0) & 0xFF, d(1) & 0xFF, d(2) & 0xFF)
      kind match {
        case "image" => ImageHeader.pngBytes(b0 % 64 + 1, b1 % 64 + 1)
        case "audio" => AvHeader.wavBytes((b0 % 4 + 1) * 11025, b1 % 2 + 1, b2 % 64 + 1)
        case _       => AvHeader.aviBytes(b0 % 64 + 1, b1 % 64 + 1, b2 % 1000 + 1)
      }
    }
    docs.select(col(idCol).as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
        unhex(md5(col(textCol))).as("digest"),
        to_json(struct(col(idCol).as("src_doc"))).as("meta"))
      .withColumn("blob", blobOf(col("kind"), col("digest")))
      .select("media_id", "kind", "blob", "meta")
  }

  final case class AvFeatures(media_id: Long, kind: String, n_bytes: Int,
                              width: Int, height: Int, sample_rate: Int,
                              channels: Int, n_frames: Int)

  /** Decode one media row across all three modalities by real header
    * parse; fields that don't apply to a modality are 0. */
  def decodeAv(id: Long, kind: String, blob: Array[Byte]): AvFeatures =
    ImageHeader.parse(blob).map { case (w, h) =>
      AvFeatures(id, kind, blob.length, w, h, 0, 0, 0)
    }.orElse(AvHeader.parseWav(blob).map { w =>
      AvFeatures(id, kind, blob.length, 0, 0, w.sampleRate, w.channels, w.nSamples)
    }).orElse(AvHeader.parseAvi(blob).map { a =>
      AvFeatures(id, kind, blob.length, a.width, a.height, 0, 0, a.frames)
    }).getOrElse(AvFeatures(id, kind, blob.length, 0, 0, 0, 0, 0))

  /** Partition-parallel batch decode of image+audio+video headers —
    * per-row REAL format parsing for all three kinds. */
  def extractAvFeatures(media: DataFrame): Dataset[AvFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "blob").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, blob) => decodeAv(id, kind, blob) }
      }
  }

  /** Per-kind feature aggregates (the downstream "training filter").
    * Image dimensions here are PARSED from real format headers, so an
    * oracle that derives the expected dims independently (from the
    * md5 bytes the fixtures encode) checks the parser end-to-end. */
  def featureStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    extractFeatures(media).toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"),
        max("width").as("max_w"), max("height").as("max_h"))
      .orderBy("kind")
  }

  // === real pixel content decode (PNG) ==============================

  /**
   * Synthetic pixel-media table: every doc becomes a REAL deflate-
   * compressed RGB PNG whose pixel values follow a deterministic
   * formula of the text's md5 digest —
   *   r(x,y) = (b0+x) mod 256, g = (b1+y) mod 256,
   *   b(x,y) = (b2+x+y) mod 256,  w = b4 mod 48 + 4, h = b5 mod 48 + 4
   * — with scanline y filtered as (b3+y) mod 5, cycling through ALL
   * five PNG filter types. Recovering the channel sums therefore
   * requires a genuine zlib inflate + unfilter pass, while an oracle
   * can recompute the expected sums arithmetically from the digest.
   * (Scalar UDF: fixture builder, not a query hot path.)
   */
  def syntheticPixelMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pngOf = udf { (d: Array[Byte]) =>
      val (b0, b1, b2, b3) = (d(0) & 0xFF, d(1) & 0xFF, d(2) & 0xFF, d(3) & 0xFF)
      val w = (d(4) & 0xFF) % 48 + 4
      val h = (d(5) & 0xFF) % 48 + 4
      val px = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = (y * w + x) * 3
          px(o) = ((b0 + x) % 256).toByte
          px(o + 1) = ((b1 + y) % 256).toByte
          px(o + 2) = ((b2 + x + y) % 256).toByte
          x += 1
        }
        y += 1
      }
      PngPixels.encode(w, h, 3, px, yy => (b3 + yy) % 5)
    }
    docs.select(col(idCol).as("media_id"),
        unhex(md5(col(textCol))).as("digest"))
      .withColumn("blob", pngOf(col("digest")))
      .select("media_id", "blob")
  }

  /**
   * Synthetic PCM-audio table: every doc becomes a REAL 16-bit PCM WAV
   * whose interleaved samples follow a deterministic formula of the
   * text's md5 digest —
   *   s(i) = ((b0+1)·(i+1) + 7·b1) mod 65536 − 32768
   * with ch = b2 mod 2 + 1 channels, b3 mod 400 + 50 frames, and
   * rate = (b4 mod 4 + 1)·11025 — so an oracle recomputes every
   * statistic arithmetically while Spark must genuinely parse the RIFF
   * layout and little-endian payload. (Scalar UDF: fixture builder.)
   */
  def syntheticPcmMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wavOf = udf { (d: Array[Byte]) =>
      val (b0, b1, b2, b3, b4) =
        (d(0) & 0xFF, d(1) & 0xFF, d(2) & 0xFF, d(3) & 0xFF, d(4) & 0xFF)
      val ch = b2 % 2 + 1
      val n = (b3 % 400 + 50) * ch
      val pcm = Array.tabulate[Short](n)(i =>
        (((b0 + 1) * (i + 1) + 7 * b1) % 65536 - 32768).toShort)
      AvHeader.wavBytesPcm((b4 % 4 + 1) * 11025, ch, pcm)
    }
    docs.select(col(idCol).as("media_id"),
        unhex(md5(col(textCol))).as("digest"))
      .withColumn("blob", wavOf(col("digest")))
      .select("media_id", "blob")
  }

  final case class AudioStats(media_id: Long, sample_rate: Int, channels: Int,
                              n_frames: Int, n_samples: Long, sum_pcm: Long,
                              sum_sq: Long, peak: Int, mean_pcm: Double,
                              mean_square: Double)

  /** Per-clip sample statistics from REAL PCM decode
    * ([[AvHeader.decodeWavSamples]]): exact integer first/second
    * moments and peak over the interleaved payload. Undecodable rows
    * are dropped (decoder bugs surface as row-count mismatches). */
  final case class AudioFingerprint(media_id: Long, sample_rate: Int,
                                    channels: Int, n_frames: Int, afp: Long)

  /** Spectral fingerprint per clip off the real RIFF/PCM parse —
    * [[AudioFp]]'s sign-of-band-energy bits; identical audio
    * fingerprints identically whatever container delivered it. */
  def audioFingerprint(media: DataFrame): Dataset[AudioFingerprint] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          AvHeader.decodeWavSamples(blob).map { case (info, pcm) =>
            AudioFingerprint(id, info.sampleRate, info.channels,
              info.nSamples, AudioFp.fingerprint(pcm, info.channels))
          }
        }
      }
  }

  def audioStats(media: DataFrame): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          AvHeader.decodeWavSamples(blob).map { case (info, pcm) =>
            var (s, q) = (0L, 0L)
            var peak = 0
            var i = 0
            while (i < pcm.length) {
              val v = pcm(i).toInt
              s += v
              q += v.toLong * v
              val a = math.abs(v)
              if (a > peak) peak = a
              i += 1
            }
            AudioStats(id, info.sampleRate, info.channels, info.nSamples,
              pcm.length.toLong, s, q, peak,
              s.toDouble / pcm.length, q.toDouble / pcm.length)
          }
        }
      }
  }

  final case class PixelStats(media_id: Long, width: Int, height: Int,
                              n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long,
                              mean_r: Double, mean_g: Double, mean_b: Double)

  /** Per-image channel statistics from REAL pixel decode
    * ([[PngPixels.decode]]: inflate + unfilter), partition-parallel.
    * Undecodable rows are dropped (a decoder bug thus surfaces as a
    * row-count mismatch against the oracle, never as silent zeros). */
  /** Route a blob to the pixel codec its magic bytes name — the
    * decoder a mixed-format corpus column actually needs. */
  def decodePixels(blob: Array[Byte]): Option[PngPixels.Image] =
    if (blob.length >= 2 && blob(0) == 'B' && blob(1) == 'M') BmpPixels.decode(blob)
    else if (blob.length >= 4 && blob(0) == 'G' && blob(1) == 'I' && blob(2) == 'F')
      GifPixels.decode(blob)
    else PngPixels.decode(blob)

  /**
   * Mixed-format synthetic media: even docs become REAL 24-bit BMPs
   * (bottom-up padded BGR rows), odd docs REAL LZW-compressed GIFs
   * (256-entry palette, variable-width codes). Pixels follow
   * deterministic md5 formulas the oracle recomputes arithmetically —
   * values only come out right through genuine format decodes
   * (row-flip + BGR swap for BMP, LZW + palette resolution for GIF).
   */
  def syntheticFormatMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val blobOf = udf { (id: Long, d: Array[Byte]) =>
      val (b0, b1, b2, b3) = (d(0) & 0xFF, d(1) & 0xFF, d(2) & 0xFF, d(3) & 0xFF)
      val w = (d(4) & 0xFF) % 48 + 4
      val h = (d(5) & 0xFF) % 48 + 4
      if (id % 2 == 0) {
        val px = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val o = (y * w + x) * 3
            px(o) = ((b0 + x) % 256).toByte
            px(o + 1) = ((b1 + y) % 256).toByte
            px(o + 2) = ((b2 + x + y) % 256).toByte
            x += 1
          }
          y += 1
        }
        BmpPixels.encode(w, h, px)
      } else {
        val palette = new Array[Byte](256 * 3)
        var i = 0
        while (i < 256) {
          palette(i * 3) = ((b0 + i) % 256).toByte
          palette(i * 3 + 1) = ((b1 + i) % 256).toByte
          palette(i * 3 + 2) = ((b2 + i) % 256).toByte
          i += 1
        }
        val idx = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            idx(y * w + x) = ((3 * x + 7 * y + b3) % 256).toByte
            x += 1
          }
          y += 1
        }
        GifPixels.encode(w, h, palette, idx)
      }
    }
    docs.select(col(idCol).as("media_id"),
        unhex(md5(col(textCol))).as("digest"))
      .withColumn("blob", blobOf(col("media_id"), col("digest")))
      .select("media_id", "blob")
  }

  final case class FormatPixelStats(media_id: Long, fmt: String, width: Int,
                                    height: Int, n_pixels: Long, sum_r: Long,
                                    sum_g: Long, sum_b: Long)

  /** Per-image channel sums through the magic-byte dispatch — one
    * mapPartitions decode pass over a mixed BMP/GIF/PNG column. */
  def formatPixelStats(media: DataFrame): Dataset[FormatPixelStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          val fmt =
            if (blob.length >= 2 && blob(0) == 'B' && blob(1) == 'M') "bmp"
            else if (blob.length >= 3 && blob(0) == 'G' && blob(1) == 'I' && blob(2) == 'F') "gif"
            else "png"
          decodePixels(blob).map { img =>
            var (sr, sg, sb) = (0L, 0L, 0L)
            var i = 0
            val n = img.width * img.height
            while (i < n) {
              val o = i * img.channels
              sr += img.pixels(o) & 0xFF
              sg += img.pixels(o + 1) & 0xFF
              sb += img.pixels(o + 2) & 0xFF
              i += 1
            }
            FormatPixelStats(id, fmt, img.width, img.height, n.toLong, sr, sg, sb)
          }
        }
      }
  }

  final case class ImagePhash(media_id: Long, width: Int, height: Int,
                              phash: Long)

  /**
   * Perceptual hash per image: decode (format routed by magic bytes —
   * a mixed PNG/BMP/GIF column hashes identically for identical
   * pixels) then [[PHash.phash]]. mapPartitions because the decoders
   * are byte-walking parsers, like the other content extractors here.
   * Undecodable rows drop (surfaces as a row-count mismatch, never
   * silent zeros).
   */
  def imagePhash(media: DataFrame): Dataset[ImagePhash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          decodePixels(blob).map { img =>
            ImagePhash(id, img.width, img.height, PHash.phash(img))
          }
        }
      }
  }

  def pixelStats(media: DataFrame): Dataset[PixelStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "blob").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          PngPixels.decode(blob).map { img =>
            var (sr, sg, sb) = (0L, 0L, 0L)
            var i = 0
            val n = img.width * img.height
            while (i < n) {
              val o = i * img.channels
              sr += img.pixels(o) & 0xFF
              sg += img.pixels(o + 1) & 0xFF
              sb += img.pixels(o + 2) & 0xFF
              i += 1
            }
            PixelStats(id, img.width, img.height, n.toLong, sr, sg, sb,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
          }
        }
      }
  }
}
