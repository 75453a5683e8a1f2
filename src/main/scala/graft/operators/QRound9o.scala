package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 14 (SURVEY §2.27):
  *
  *  - `mm_laplacian_var`: variance-of-Laplacian image sharpness through
  *    the real P6 decode — the standard blur detector an image-curation
  *    pipeline filters on.
  *  - `win_running_median`: per-user running median of event value — the
  *    robust running-center beside the running sum/mean (no engine has a
  *    median window aggregate with an incremental state, so the exact
  *    prefix-sort spelling IS the operator).
  *  - `agg_mutual_info`: mutual information between the event-type and
  *    user-bucket categoricals — the dependence audit beside the entropy
  *    profile and PMI.
  *  - `stream_available_now`: Trigger.AvailableNow incremental-batch
  *    execution over the file landing zone — the catch-up mode a nightly
  *    streaming job runs; batch twin declared, Round9oSpec proves the
  *    triggered run drains to the identical aggregate.
  */
object QRound9o extends QueryPack {

  // ---- mm_laplacian_var ----

  /** Variance of the 4-neighbor Laplacian over the red channel's
    * interior pixels: blur collapses local contrast, so low Laplacian
    * variance ⇒ blurry (the classic OpenCV-folklore focus measure). The
    * kernel and both moments are exact integers inside the partition-
    * batched decode; the ONE division (n·ΣL² − (ΣL)²)/n² is trunc4'd,
    * and the blur flag compares the trunc4'd value against `4e4`
    * (probed ~20% of the corpus) — the threshold-cut discipline. The
    * oracle replays the synthesis formula per interior pixel, so any
    * header-parse, stride, or kernel bug breaks the hash.
    *
    * Scale shape: per-partition batch decode (the mm family shape);
    * only the per-image 4-column rollup shuffles. */
  private[graft] def laplacianVar(media: org.apache.spark.sql.Dataset[
      Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Multimodal.pixelPlane(r.payload).flatMap { case (w, h, px) =>
        if (w < 3 || h < 3) None
        else {
          def red(row: Int, c: Int): Long = (px((row * w + c) * 3) & 0xff).toLong
          var n = 0L; var s = 0L; var ss = 0L
          var row = 1
          while (row < h - 1) {
            var c = 1
            while (c < w - 1) {
              val l = 4 * red(row, c) - red(row - 1, c) - red(row + 1, c) -
                red(row, c - 1) - red(row, c + 1)
              n += 1; s += l; ss += l * l
              c += 1
            }
            row += 1
          }
          Some((r.media_id, n, s, ss))
        }
      }
    }).toDF("media_id", "n_interior", "lap_sum", "lap_sumsq")
      .select(col("media_id"), col("n_interior"),
        trunc4((col("n_interior") * col("lap_sumsq") -
          col("lap_sum") * col("lap_sum")).cast(DoubleType) /
          (col("n_interior") * col("n_interior")).cast(DoubleType))
          .as("lap_var"))
      .withColumn("is_blurry",
        when(col("lap_var") < lit(4e4), 1).otherwise(0))
      .orderBy("media_id")
  }

  private def mmLaplacianVar(s: SparkSession, d: String): DataFrame =
    laplacianVar(Multimodal.mediaFromPpm(s, d))

  private val oMmLaplacianVar = {
    val v = oTrunc4("CAST(n*ss - s*s AS DOUBLE) / CAST(n*n AS DOUBLE)")
    s"""WITH d AS (SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS w,
       |    CAST(3 + doc_id % 4 AS INT) AS h FROM documents),
       |cells AS (SELECT doc_id, w, h, r.r, c.c,
       |    4*((doc_id*31 + ((r.r*w+c.c)*3)*7) % 256)
       |    - ((doc_id*31 + (((r.r-1)*w+c.c)*3)*7) % 256)
       |    - ((doc_id*31 + (((r.r+1)*w+c.c)*3)*7) % 256)
       |    - ((doc_id*31 + ((r.r*w+c.c-1)*3)*7) % 256)
       |    - ((doc_id*31 + ((r.r*w+c.c+1)*3)*7) % 256) AS lap
       |  FROM d,
       |    LATERAL (SELECT unnest(generate_series(1, h-2)) AS r) r,
       |    LATERAL (SELECT unnest(generate_series(1, w-2)) AS c) c),
       |m AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(lap) AS BIGINT) AS s,
       |    CAST(sum(lap*lap) AS BIGINT) AS ss
       |  FROM cells GROUP BY 1)
       |SELECT doc_id AS media_id, n AS n_interior, $v AS lap_var,
       |  CAST(CASE WHEN $v < 4e4 THEN 1 ELSE 0 END AS INT) AS is_blurry
       |FROM m ORDER BY media_id""".stripMargin
  }

  // ---- win_running_median ----

  /** Running median of a user's event values (exact cents): the robust
    * "typical spend so far" curve a z-score running mean distorts on a
    * single whale event. Neither engine carries incremental median
    * window state, so the exact spelling sorts each prefix — emitted as
    * 2×median so the even-prefix interpolation ((a+b)/2) stays an exact
    * BIGINT with no doubles anywhere.
    *
    * Scale shape: one user-partitioned window pass; prefixes are
    * session-scale (the per-user-bounded assumption every chp_* key
    * carries). The lake-scale swap for unbounded keys is the two-heap
    * streaming median inside mapGroups — documented, not needed at this
    * per-user cardinality. */
  private[graft] def runningMedian(events: DataFrame): DataFrame = {
    val e = events.select(col("event_id"), col("user_id"),
      expr("unix_micros(cast(ts as timestamp))").as("us"),
      floor(col("value") * lit(1e2) + lit(5e-1)).cast(LongType).as("cents"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("arr", array_sort(collect_list(col("cents")).over(w)))
      .withColumn("n", size(col("arr")))
      // integer div for the indices: Column `/` is double division
      .withColumn("med2x_cents", expr(
        "CASE WHEN n % 2 = 1 THEN element_at(arr, CAST((n + 1) div 2 AS INT)) * 2 " +
        "ELSE element_at(arr, CAST(n div 2 AS INT)) + " +
        "element_at(arr, CAST(n div 2 + 1 AS INT)) END"))
      .select("event_id", "user_id", "med2x_cents")
      .orderBy("event_id")
  }

  private def winRunningMedian(s: SparkSession, d: String): DataFrame =
    runningMedian(t(s, d, "events"))

  private val oWinRunningMedian =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
      |    CAST(floor(value * 1e2 + 5e-1) AS BIGINT) AS cents FROM events)
      |SELECT event_id, user_id,
      |  CAST(2 * median(cents) OVER (PARTITION BY user_id
      |    ORDER BY us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS med2x_cents
      |FROM e ORDER BY event_id""".stripMargin

  // ---- agg_mutual_info ----

  /** Mutual information (nats) between the event-type and user-bucket
    * (user_id mod 10) categoricals: MI = Σ_xy (c_xy/n)·ln(n·c_xy /
    * (c_x·c_y)) — "does WHAT users do depend on WHO they are". The cell
    * table is bounded (types×10); each cell's term is scaled-to-long and
    * the sum is exact (the entropy-profile discipline); one descale +
    * trunc6.
    *
    * Scale shape: one events pass → a bounded-cardinality cell
    * aggregate; marginals derive from the cells, never a second corpus
    * pass. */
  private[graft] def mutualInfo(events: DataFrame): DataFrame = {
    val cells = events
      .select(col("event_type"), (col("user_id") % 10).as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("c_xy"))
    val mx = cells.groupBy("event_type").agg(sum(col("c_xy")).as("c_x"))
    val my = cells.groupBy("bucket").agg(sum(col("c_xy")).as("c_y"))
    val n = cells.agg(sum(col("c_xy")).as("n"))
    cells.join(broadcast(mx), "event_type").join(broadcast(my), "bucket")
      .crossJoin(broadcast(n))
      .withColumn("t_scaled",
        floor(col("c_xy").cast(DoubleType) / col("n") *
          log((col("n") * col("c_xy")).cast(DoubleType) /
            (col("c_x") * col("c_y")).cast(DoubleType)) * lit(1e12) +
          lit(5e-1)).cast(LongType))
      .agg(max(col("n")).as("n_events"),
        count(lit(1)).as("n_cells"),
        trunc6(sum(col("t_scaled")) / lit(1e12)).as("mi_nats"))
  }

  private def aggMutualInfo(s: SparkSession, d: String): DataFrame =
    mutualInfo(t(s, d, "events"))

  private val oAggMutualInfo =
    s"""WITH cells AS (SELECT event_type, user_id % 10 AS bucket,
       |    CAST(count(*) AS BIGINT) AS c_xy FROM events GROUP BY 1, 2),
       |mx AS (SELECT event_type, CAST(sum(c_xy) AS BIGINT) AS c_x
       |  FROM cells GROUP BY 1),
       |my AS (SELECT bucket, CAST(sum(c_xy) AS BIGINT) AS c_y
       |  FROM cells GROUP BY 1),
       |n AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n FROM cells),
       |terms AS (SELECT CAST(floor(CAST(c.c_xy AS DOUBLE) / n.n *
       |    ln(CAST(n.n * c.c_xy AS DOUBLE) / CAST(mx.c_x * my.c_y AS DOUBLE))
       |    * 1e12 + 5e-1) AS BIGINT) AS t_scaled, n.n
       |  FROM cells c JOIN mx USING (event_type) JOIN my USING (bucket), n)
       |SELECT max(n) AS n_events, CAST(count(*) AS BIGINT) AS n_cells,
       |  ${oTrunc6("sum(t_scaled) / 1e12")} AS mi_nats
       |FROM terms""".stripMargin

  // ---- stream_available_now ----

  /** Per-(type, day) counts over the staged landing-zone directory —
    * declared as the batch read; Round9oSpec re-executes it under
    * Trigger.AvailableNow (drain-everything-then-stop, several
    * micro-batches) and proves the final aggregate identical. The
    * incremental-batch mode is how a production pipeline catches up a
    * backlog with streaming-exactly-once semantics but batch
    * scheduling. */
  private[graft] def availableNowAgg(df: DataFrame): DataFrame =
    df.select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "day")

  private def streamAvailableNow(s: SparkSession, d: String): DataFrame =
    availableNowAgg(s.read.parquet(QRound9i.stagedEventsDir(s, d)))

  private val oStreamAvailableNow =
    """SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin

  val queries: Map[String, QFn] = Map(
    "mm_laplacian_var"     -> mmLaplacianVar _,
    "win_running_median"   -> winRunningMedian _,
    "agg_mutual_info"      -> aggMutualInfo _,
    "stream_available_now" -> streamAvailableNow _)

  val oracles: Map[String, String] = Map(
    "mm_laplacian_var"     -> oMmLaplacianVar,
    "win_running_median"   -> oWinRunningMedian,
    "agg_mutual_info"      -> oAggMutualInfo,
    "stream_available_now" -> oStreamAvailableNow)
}
