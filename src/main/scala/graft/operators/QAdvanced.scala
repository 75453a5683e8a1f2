package graft.operators

import graft.QueryPack
import graft.functions.GeoMean
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Custom-aggregate and multimodal-column surfaces — SURVEY.md §2.4
  * (`udaf_geomean`) + the north-star multimodal plumbing (BASELINE.json:6).
  *
  * Multimodal design: media payloads are opaque `binary` columns with typed
  * metadata columns alongside (the lakehouse-standard layout). Decoding is
  * a per-partition transform (see graft.operators.Multimodal) so codecs run
  * where the bytes already are — no driver collect, no shuffle. In this
  * container there is no image/audio codec, so decode is a clearly-marked
  * deterministic stub; the Spark-side schema/partitioning/batching is real.
  */
object QAdvanced extends QueryPack {

  /** Geometric mean of l_quantity per returnflag via a typed Aggregator —
    * partial-aggregable (map-side combine), see GeoMean. */
  private def udafGeomean(s: SparkSession, d: String): DataFrame = {
    val gm = udaf(GeoMean, org.apache.spark.sql.Encoders.scalaDouble)
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(trunc4(gm(col("l_quantity"))).as("geo_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  private val oUdafGeomean =
    s"""SELECT l_returnflag,
       |  ${oTrunc4("exp(avg(ln(l_quantity)))")} AS geo_qty, count(*) AS n
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Opaque-binary plumbing: bytes + length + content digest + header hex +
    * stubbed "decode" metadata derived deterministically from the payload. */
  private def mmBinaryMeta(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("payload", col("text").cast(BinaryType))
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"),
        substring(hex(col("payload")), 1, 8).as("header_hex"),
        // STUB decode: deterministic fake media dimensions from byte length
        // (real decoders plug into Multimodal.decodePartition).
        (length(col("payload")) % 640).as("fake_w"),
        ((length(col("payload")) * 7) % 480).as("fake_h"),
        (length(col("payload")) % 30 + 1).as("fake_frames"))
      .orderBy("doc_id")

  private val oMmBinaryMeta =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  md5(text) AS digest,
      |  substr(hex(encode(text)), 1, 8) AS header_hex,
      |  CAST(octet_length(encode(text)) % 640 AS INT) AS fake_w,
      |  CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS fake_h,
      |  CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS fake_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Real media decode: synthesized P6 payloads parsed by the actual PPM
    * decoder (header, comments, dims, raw RGB stats) in per-partition
    * batches. The oracle never parses bytes — it recomputes the pixel
    * statistics analytically from the synthesis formula, so any parse
    * offset/sign bug in the decoder shows up as a brightness mismatch. */
  private def mmDecodePpm(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeAll(Multimodal.mediaFromPpm(s, d))
      .select(col("media_id"), col("width"), col("height"),
        trunc4(col("brightness")).as("brightness"))
      .orderBy("media_id")

  private val oMmDecodePpm =
    s"""WITH d AS (SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS width,
       |             CAST(3 + doc_id % 4 AS INT) AS height FROM documents),
       |  px AS (SELECT doc_id, width, height,
       |           unnest(generate_series(0, width*height*3 - 1)) AS i FROM d)
       |SELECT doc_id AS media_id, width, height,
       |  ${oTrunc4("CAST(SUM((doc_id*31 + i*7) % 256) AS DOUBLE)/(width*height*3)/255")} AS brightness
       |FROM px GROUP BY doc_id, width, height ORDER BY media_id""".stripMargin

  /** Frame sampling over multi-frame ("video") payloads: decode every 2nd
    * frame of each concatenated-P6 payload and report exact sampled-frame
    * statistics. The oracle recomputes the same statistics analytically
    * from the synthesis formula — a frame-boundary or sampling-stride bug
    * shifts every downstream byte and breaks the hash. */
  private def mmFrameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.videosFromDocuments(s, d), every = 2)
      .select(col("media_id"), col("n_frames"), col("n_sampled"),
        trunc4(col("brightness")).as("brightness"))
      .orderBy("media_id")

  private val oMmFrameSample =
    s"""WITH d AS (SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS w,
       |             CAST(3 + doc_id % 4 AS INT) AS h,
       |             CAST(2 + doc_id % 4 AS INT) AS nf FROM documents),
       |  f AS (SELECT doc_id, w, h, nf,
       |          unnest(generate_series(0, nf - 1)) AS fr FROM d),
       |  sfr AS (SELECT * FROM f WHERE fr % 2 = 0),
       |  px AS (SELECT doc_id, w, h, nf, fr,
       |           unnest(generate_series(0, w*h*3 - 1)) AS i FROM sfr)
       |SELECT doc_id AS media_id, nf AS n_frames,
       |  CAST(count(DISTINCT fr) AS INT) AS n_sampled,
       |  ${oTrunc4("CAST(SUM((doc_id*31 + fr*13 + i*7) % 256) AS DOUBLE) / (count(*) * 255)")} AS brightness
       |FROM px GROUP BY doc_id, nf ORDER BY media_id""".stripMargin

  /** Audio modality: synthesized RIFF/WAVE PCM payloads parsed by a real
    * byte-level decoder (magics, fmt/data chunks, little-endian sign-
    * extended samples); mean |amplitude| from an exact integer sum with
    * one final division. Oracle recomputes from the synthesis formula. */
  private def mmAudioWav(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeAudio(Multimodal.audioFromDocuments(s, d))
      .select(col("media_id"), col("sample_rate"), col("n_samples"),
        trunc4(col("mean_abs")).as("mean_abs"))
      .orderBy("media_id")

  private val oMmAudioWav =
    s"""WITH d AS (SELECT doc_id, CAST(64 + doc_id % 64 AS INT) AS n FROM documents),
       |  sm AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM d)
       |SELECT doc_id AS media_id, 8000 AS sample_rate, n AS n_samples,
       |  ${oTrunc4("CAST(SUM(ABS((doc_id*37 + i*11) % 2048 - 1024)) AS DOUBLE) / (n * 1024)")} AS mean_abs
       |FROM sm GROUP BY doc_id, n ORDER BY media_id""".stripMargin

  /** Resize (nearest-neighbor 2× downsample) as a feature-extraction
    * stage: decode the P6 plane, keep even (row, col) pixels via pure
    * index arithmetic (no resampled image materialized), report resized
    * dims + sampled-pixel brightness. Oracle recomputes the sampled-pixel
    * statistics analytically from the synthesis formula — an off-by-one in
    * the sampling grid or row stride shifts bytes and breaks the hash. */
  private def mmResizePpm(s: SparkSession, d: String): DataFrame =
    Multimodal.resizeAll(Multimodal.mediaFromPpm(s, d))
      .select(col("media_id"), col("rw"), col("rh"),
        trunc4(col("brightness")).as("brightness"))
      .orderBy("media_id")

  private val oMmResizePpm =
    s"""WITH d AS (SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS w,
       |             CAST(3 + doc_id % 4 AS INT) AS h FROM documents),
       |  rr AS (SELECT doc_id, w, h,
       |           unnest(generate_series(0, h - 1, 2)) AS r FROM d),
       |  cc AS (SELECT doc_id, w, h, r,
       |           unnest(generate_series(0, w - 1, 2)) AS c FROM rr),
       |  px AS (SELECT doc_id, w, h,
       |           unnest(generate_series(0, 2)) AS ch, r, c FROM cc)
       |SELECT doc_id AS media_id,
       |  CAST((w + 1) // 2 AS INT) AS rw, CAST((h + 1) // 2 AS INT) AS rh,
       |  ${oTrunc4("CAST(SUM((doc_id*31 + ((r*w + c)*3 + ch)*7) % 256) AS DOUBLE)" +
                    " / (((w + 1) // 2) * ((h + 1) // 2) * 3) / 255")} AS brightness
       |FROM px GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "udaf_geomean"    -> udafGeomean _,
    "mm_binary_meta"  -> mmBinaryMeta _,
    "mm_decode_ppm"   -> mmDecodePpm _,
    "mm_resize_ppm"   -> mmResizePpm _,
    "mm_frame_sample" -> mmFrameSample _,
    "mm_audio_wav"    -> mmAudioWav _)

  val oracles: Map[String, String] = Map(
    "udaf_geomean"    -> oUdafGeomean,
    "mm_binary_meta"  -> oMmBinaryMeta,
    "mm_decode_ppm"   -> oMmDecodePpm,
    "mm_resize_ppm"   -> oMmResizePpm,
    "mm_frame_sample" -> oMmFrameSample,
    "mm_audio_wav"    -> oMmAudioWav)
}
