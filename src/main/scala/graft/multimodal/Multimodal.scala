package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2 C, `mm_features`): treat
  * image/audio/video payloads as opaque binary columns with typed metadata,
  * and run decode/feature-extract as a per-partition batch loop — the Scala
  * analog of `mapInPandas` (batched, no per-row JVM<->codec round trips).
  *
  * The codec libraries are not present in this container, so [[StubCodec]]
  * is a clearly-marked deterministic stand-in; the Spark-side plumbing —
  * schema, batch shape, partition-level processing — is real and tested.
  * At 100 TB the pattern holds: payloads stay distributed, decode is
  * embarrassingly parallel per partition, features are columnar outputs.
  */
object Multimodal {

  case class MediaRecord(id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(id: Long, kind: String, nBytes: Long,
      checksum: Long, width: Int, height: Int, frames: Int)

  /** STUB: deterministic pseudo-decode standing in for a real image/audio
    * codec. A production build replaces `decode` with e.g. a JNI codec or
    * TwelveMonkeys ImageIO call — signature and batch shape unchanged. */
  object StubCodec {
    def checksum(payload: Array[Byte]): Long =
      payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)

    /** (width, height, frames) derived deterministically from content. */
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
      val c = checksum(payload)
      val frames = kind match {
        case "video" => 1 + (c % 240).toInt
        case "audio" => 1 + (c % 48000).toInt
        case _ => 1
      }
      (16 + (c % 64).toInt, 16 + ((c / 64) % 64).toInt, frames)
    }
  }

  /** Batched per-partition feature extraction (mapInPandas analog). */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val (w, h, f) = StubCodec.decode(r.kind, r.payload)
        MediaFeatures(r.id, r.kind, r.payload.length.toLong,
          StubCodec.checksum(r.payload), w, h, f)
      }
    }
  }

  /** Wrap an arbitrary table into media records (payload = a string column
    * cast to binary), preserving partitioning. */
  def asMediaRecords(df: DataFrame, idCol: String, payloadCol: String,
      kind: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast(LongType).as("id"),
      lit(kind).as("kind"),
      col(payloadCol).cast(BinaryType).as("payload"))
      .as[MediaRecord]
  }
}
