package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` payloads with typed metadata, and per-batch feature
  * extraction runs inside `mapPartitions` so each task amortizes decoder
  * setup over its whole partition (the JVM analogue of a batched
  * Arrow-UDF pipeline).
  *
  * The actual codec step is STUBBED — this container ships no image/audio
  * libraries — behind [[MediaDecoder.decodeStub]], a deterministic fake
  * keyed on payload bytes. Everything around it is real and tested:
  * schema, binary handling, partition-batched execution, feature-vector
  * output shape.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      features: Array[Float])

  val FeatureDim = 8

  object MediaDecoder {
    /** STUB decode: a real implementation would hand `payload` to an image
      * or audio codec here. The fake derives (width, height) and an
      * 8-bin byte histogram deterministically from the bytes, so plumbing
      * tests have stable golden values.
      */
    def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val w = 16 + (if (payload.isEmpty) 0 else (payload(0) & 0x3f))
      val h = 16 + (if (payload.length < 2) 0 else (payload(1) & 0x3f))
      val hist = new Array[Float](FeatureDim)
      payload.foreach(b => hist((b & 0xff) % FeatureDim) += 1f)
      val n = math.max(1, payload.length).toFloat
      (w, h, hist.map(_ / n))
    }
  }

  /** Wrap any table with a string column as a media table (fixture stand-in
    * for real binary ingestion: payload = utf-8 bytes). Kind cycles
    * deterministically to exercise per-kind dispatch.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
      col(payloadCol).cast("binary").as("payload"))

  /** Batched feature extraction: one decoder instantiation per partition,
    * streamed row-by-row (no per-partition materialization). Partition
    * count governs decode parallelism — repartition upstream by media_id
    * for even batches at scale.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder setup would happen here (codec contexts,
        // model weights, ...) — amortized across the whole batch
        rows.map { r =>
          val (w, h, feats) = MediaDecoder.decodeStub(r.payload)
          MediaFeatures(r.media_id, r.kind, r.payload.length, w, h, feats)
        }
      }
  }
}
