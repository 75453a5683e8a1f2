package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TriProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(l: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"TRIPROF $l ${(System.nanoTime()-t0)/1e9}%.2f s -> $r")
    }
    val e = graft.operators.QRound5c.coEdges(graft.sources.Tables.t(spark, d, "lineitem")).persist()
    time("edge_build_count")(e.count())
    time("edge_count_again")(e.count())
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    time("wedges")(deg.select(sum(col("deg")*(col("deg")-1)/2)).collect()(0))
    val tri1 = e.as("e1").join(broadcast(e.as("e2")), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("wa"), col("e2.b").as("wc"))
    time("wedge_enum_only")(tri1.count())
    val tri2 = tri1.join(broadcast(e.as("e3")), col("wa") === col("e3.a") && col("wc") === col("e3.b"))
    time("full_triangles")(tri2.count())
    time("full_triangles_again")(tri2.count())
    spark.stop()
  }
}
