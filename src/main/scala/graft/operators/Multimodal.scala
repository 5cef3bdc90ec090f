package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-
  * sample stages (build brief §multimodal).
  *
  * The Spark-side plumbing — schema, partition sizing, batch shape, typed
  * stages — is real and tested. The codec itself is STUBBED with a
  * deterministic fake (`FakeCodec`): the container has no image/audio
  * libraries, and the brief asks for exactly this split. Swapping
  * `FakeCodec` for a real decoder (javacv, a JNI codec, …) changes no
  * plan shape: `mapPartitions` keeps the decode columnar-batch-friendly and
  * amortizes per-partition codec initialization, the Scala analogue of
  * `mapInPandas` batching.
  *
  * Scale notes: media blobs dominate row size, so
  * `spark.sql.files.maxPartitionBytes` governs decode parallelism, and
  * derived features should be written WITHOUT the content column (column
  * pruning keeps the blob out of downstream scans entirely).
  */
object Multimodal {

  /** One media row: content is opaque bytes + routing metadata. */
  case class MediaRow(media_id: Long, media_type: String, content: Array[Byte],
                      source: String)

  /** Decoded per-item features (fake but deterministic). */
  case class MediaFeatures(media_id: Long, media_type: String, width: Int,
                           height: Int, n_frames: Int, mean_intensity: Double)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("source", StringType, nullable = false)))

  /** Deterministic fake codec — STUB standing in for a real decoder.
    * Derives "decoded" properties purely from the bytes so every stage
    * downstream is testable and reproducible. */
  object FakeCodec {
    def decode(row: MediaRow): MediaFeatures = {
      val bytes = row.content
      def byteAt(i: Int): Int = if (bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xff
      val width = 16 + byteAt(0) * 4
      val height = 16 + byteAt(1) * 4
      val frames = row.media_type match {
        case "video" => 1 + byteAt(2) % 64
        case "audio" => 1 + byteAt(2) % 16
        case _ => 1
      }
      val mean = if (bytes.isEmpty) 0.0 else bytes.map(_ & 0xff).sum.toDouble / bytes.length
      MediaFeatures(row.media_id, row.media_type, width, height, frames, mean)
    }

    /** Fake resize: recompute deterministic features at a target size. */
    def resize(f: MediaFeatures, w: Int, h: Int): MediaFeatures =
      f.copy(width = w, height = h)
  }

  /** Synthesize a deterministic media table from the documents table
    * (text bytes stand in for encoded media) — the testdata carrier. */
  def syntheticMedia(spark: SparkSession, docsDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.register(spark, docsDir)
    spark.table("documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("content"),
        col("source"))
      .as[MediaRow]
  }

  /** Decode stage: per-partition batch decode (codec init once per
    * partition — the mapInPandas-batch analogue in Scala). */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs initialize libraries here, once per partition
      it.map(FakeCodec.decode)
    }
  }

  /** Frame-sample stage: every `stride`-th frame index per video/audio item,
    * as (media_id, frame_idx) — a generator (posexplode) over the decoded
    * frame count, no blob movement. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame =
    features.toDF()
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Resize stage (stubbed geometry change, plan shape real). */
  def resizeAll(features: Dataset[MediaFeatures], w: Int, h: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.mapPartitions(_.map(FakeCodec.resize(_, w, h)))
  }
}
