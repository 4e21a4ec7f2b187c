package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata travelling alongside. The decode /
  * feature-extract step runs per-partition (one codec context per
  * partition, batch-amortized) — the Spark-side shape is real; the codec
  * itself is stubbed behind [[Multimodal.Decoder]] because no media
  * libraries ship in this environment. Swapping in a real decoder changes
  * one function, not the plan.
  */
object Multimodal {

  /** Typed metadata carried with every media payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("byte_len", LongType, nullable = false),
    StructField("sha", StringType, nullable = false)))

  /** Feature row produced by the decode stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** The pluggable decode step. The deterministic fake hashes payload
    * bytes into a tiny feature vector — enough to exercise partitioning,
    * batch shape, and schema end-to-end. A real deployment implements
    * `decode` with the actual codec (per-partition init, reused across
    * rows).
    */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte], mediaType: String): Array[Double]
  }

  object FakeDecoder extends Decoder {
    def decode(payload: Array[Byte], mediaType: String): Array[Double] = {
      // deterministic 4-dim "feature": byte count, first/last byte, and the
      // first byte of the md5 digest — every component is reproducible from
      // the raw bytes in any engine, which keeps the stub oracle-checkable
      val n = payload.length.toDouble
      val first = if (payload.nonEmpty) (payload(0) & 0xff).toDouble else 0d
      val last = if (payload.nonEmpty) (payload(payload.length - 1) & 0xff).toDouble else 0d
      val digest = java.security.MessageDigest.getInstance("MD5").digest(payload)
      Array(n, first, last, (digest(0) & 0xff).toDouble)
    }
  }

  /** Wrap any binary-bearing frame into the media model: payload +
    * length + content hash (the metadata extraction is pure SQL and
    * codegen'd; only `decode` needs bytes-in-JVM).
    */
  def asMedia(df: DataFrame, idCol: String, binCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(binCol).as("payload"),
      lit(mediaType).as("media_type"),
      octet_length(col(binCol)).cast("long").as("byte_len"),
      sha2(col(binCol), 256).as("sha"))

  /** Per-partition decode → features. mapPartitions keeps one decoder
    * instance per partition (where a real codec would hold its native
    * context) and streams rows through it.
    */
  def extractFeatures(media: DataFrame, decoder: Decoder = FakeDecoder): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    implicit val enc = RowEncoder.encoderFor(featureSchema)
    media.select("media_id", "media_type", "byte_len", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val feat = decoder.decode(r.getAs[Array[Byte]]("payload"),
            r.getAs[String]("media_type"))
          Row(r.getAs[Long]("media_id"), r.getAs[String]("media_type"),
            r.getAs[Long]("byte_len"), feat.toSeq)
        }
      }
  }
}
