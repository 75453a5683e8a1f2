package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev probe: break agg_weighted_median into stages and time each, to
  * find the dominant cost (coarse histogram collect vs fine pass). */
object WmProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10).count()
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val bw = 16384L
    for (rep <- 1 to 4) {
      val base = li.select(col("l_returnflag").as("flag"),
        floor(col("l_extendedprice") * lit(1e2) + lit(5e-1)).cast(LongType)
          .as("cents"),
        col("l_quantity").cast(LongType).as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bktRows = time(s"r$rep-coarse")(
        base.groupBy(col("flag"), expr(s"cents DIV $bw").as("b"))
          .agg(sum(col("w")).as("bsum")).collect())
      val med = bktRows.toSeq.groupBy(_.getString(0)).toSeq.map {
        case (f, rows) =>
          val sorted = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
          val tot = sorted.iterator.map(_._2).sum
          var cum = 0L; var i = 0
          while (2L * (cum + sorted(i)._2) < tot) { cum += sorted(i)._2; i += 1 }
          (f, sorted(i)._1, cum, tot)
      }
      val cond = med.map { case (f, mb, _, _) =>
        col("flag") === lit(f) && expr(s"cents DIV $bw") === lit(mb)
      }.reduce(_ || _)
      val fineRows = time(s"r$rep-fine")(
        base.filter(cond).groupBy("flag", "cents")
          .agg(sum(col("w")).as("cw")).collect())
      println(s"PROBE fine=${fineRows.length}")
      time(s"r$rep-unpersist")(base.unpersist())
    }
    spark.stop()
  }
}
