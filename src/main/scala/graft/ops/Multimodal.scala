package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns: media as opaque `binary` with typed metadata.
 *
 * The Spark-side plumbing is real — schema, partition-parallel batch
 * decode via mapPartitions, typed output — while the actual media
 * decode is STUBBED (`decodeStub`): this container has no image/audio
 * codecs, so the "decoder" derives deterministic fake features from
 * the bytes. Swapping in a real decoder (JNI/FFmpeg/Pillow worker)
 * changes only the function body, not the distributed shape.
 */
object Multimodal {

  /** media row: (id, kind, blob, meta json) */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("blob", BinaryType, nullable = false),
    StructField("meta", StringType, nullable = true)))

  /**
   * Build a synthetic media table from documents: the blob is the
   * md5 digest bytes of the text (deterministic 16-byte "payload").
   */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      unhex(md5(col(textCol))).as("blob"),
      to_json(struct(col(idCol).as("src_doc"))).as("meta"))

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 head_byte: Int, width: Int, height: Int,
                                 sum_bytes: Long)

  /**
   * STUB decoder: stands in for image decode / audio frame extraction.
   * Deterministic features from the payload bytes; real decoders slot
   * in here without touching the partitioning or schema.
   */
  def decodeStub(id: Long, kind: String, blob: Array[Byte]): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < blob.length) { sum += blob(i) & 0xFF; i += 1 }
    MediaFeatures(id, kind, blob.length,
      head_byte = blob(0) & 0xFF,
      width = (blob(0) & 0xFF) % 64 + 1,
      height = (blob(1) & 0xFF) % 64 + 1,
      sum_bytes = sum)
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
        it.map { case (id, kind, blob) => decodeStub(id, kind, blob) }
      }
  }

  /** Per-kind feature aggregates (the downstream "training filter"). */
  def featureStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    extractFeatures(media).toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"),
        sum("sum_bytes").as("sum_bytes"), max("width").as("max_w"),
        max("height").as("max_h"))
      .orderBy("kind")
  }
}
