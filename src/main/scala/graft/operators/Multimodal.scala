package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star, BASELINE.json:6).
  *
  * Media rows are (id, payload: binary, meta) — the payload stays opaque to
  * the engine; decode/feature-extract runs as a per-partition batch
  * transform so (a) codec init cost amortizes over a partition, (b) bytes
  * never leave the executor that read them, (c) the operator pipelines with
  * any downstream DataFrame op. This mirrors how Pandas-UDF/mapInPandas
  * pipelines batch media work in PySpark, expressed natively in Scala via
  * `mapPartitions` over a typed Dataset.
  *
  * The actual codec is NOT available in this container, so `decodeStub` is
  * a clearly-marked deterministic fake (length/digest-derived). Swapping in
  * a real decoder changes only the function body — schema, partitioning and
  * batch shape are production-real.
  */
object Multimodal {

  case class MediaRow(media_id: Long, payload: Array[Byte], kind: String)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, brightness: Double)

  /** STUB decode — deterministic fake "decoded" features. A real build
    * replaces the body with e.g. a JNI image decoder; the signature and the
    * per-partition batching are the real contract. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.payload.length
    // cheap deterministic "content" statistic standing in for pixel math
    var acc = 0L
    var i = 0
    while (i < n) { acc += (r.payload(i) & 0xff); i += 1 }
    MediaFeatures(r.media_id, r.kind, n,
      width = n % 640, height = (n * 7) % 480, n_frames = n % 30 + 1,
      brightness = if (n == 0) 0.0 else acc.toDouble / n / 255.0)
  }

  /** Partition-batched decode: one decoder instance per partition. */
  def decodeAll(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.open() — once per partition
      rows.map(decodeStub)
    }
  }

  /** Build a media Dataset from the documents table (payload = utf8 bytes),
    * the container-testable stand-in for a real media lake scan. */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        col("text").cast(BinaryType).as("payload"),
        col("lang").as("kind"))
      .as[MediaRow]
  }
}
