package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** Multimodal column support (north-star extension): image/audio/video as
  * opaque binary columns + typed metadata, with decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The heavy codecs are STUBBED (this container has no image/audio
  * libraries): `FakeCodec.decode` stands in for a real JNI/FFI decoder and
  * derives deterministic metadata+features from the payload's md5, so the
  * Spark-side plumbing — binary schema, per-partition batch processing,
  * feature schema, partitioning — is real and oracle-checkable while the
  * codec itself is swappable.
  */
object Multimodal {

  case class MediaRow(id: Long, payload: Array[Byte])
  case class DecodedRow(id: Long, width: Int, height: Int, channels: Int,
      nBytes: Long, features: Array[Float])
  case class FrameRow(id: Long, frameIdx: Int, frameBytes: Array[Byte])

  /** ===== STUB ===== deterministic fake decoder. A real implementation
    * would hand `payload` to an image/audio codec; everything downstream
    * of the returned struct is production plumbing. */
  object FakeCodec {
    private def md5hex(b: Array[Byte]): String =
      MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

    def decode(payload: Array[Byte]): DecodedRow = {
      val h = md5hex(payload)
      def hex(s: String): Long = java.lang.Long.parseLong(s, 16)
      val width = (hex(h.substring(0, 6)) % 1920L).toInt + 1
      val height = (hex(h.substring(6, 12)) % 1080L).toInt + 1
      val features = Array.tabulate(4) { i =>
        val fh = md5hex((h + i).getBytes("UTF-8"))
        (hex(fh.substring(0, 6)) % 1000L).toFloat / 1000f
      }
      DecodedRow(0L, width, height, 3, payload.length.toLong, features)
    }
  }

  /** Wrap a text/bytes source into the opaque binary media schema. */
  def packBinary(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(col(idCol).as("id"), encode(col(srcCol), "UTF-8").as("payload"))

  /** Decode stage: runs per partition (the real pattern for batched codec
    * calls — one codec context per partition, rows streamed through). */
  def decode(media: DataFrame): Dataset[DecodedRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("payload")).as[MediaRow]
      .mapPartitions { it =>
        // real codecs initialize per-partition state here
        it.map(m => FakeCodec.decode(m.payload).copy(id = m.id))
      }
  }

  /** Resize stage (stub): scales metadata + re-derives the feature vector
    * deterministically; a real impl resamples pixels. */
  def resize(decoded: Dataset[DecodedRow], maxDim: Int): Dataset[DecodedRow] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { d =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(d.width, d.height))
      d.copy(width = math.max(1, (d.width * scale).toInt),
        height = math.max(1, (d.height * scale).toInt))
    }
  }

  /** Frame sampling for "video" payloads: every `stride`-th fixed-size
    * chunk becomes a frame (a real impl seeks keyframes). */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("payload")).as[MediaRow]
      .flatMap { m =>
        m.payload.grouped(frameBytes).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (chunk, i) => FrameRow(m.id, i, chunk) }
      }
  }
}
