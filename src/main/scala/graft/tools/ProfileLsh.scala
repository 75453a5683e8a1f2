package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-by-stage timing for the LSH dedup pipeline (dev tool). */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10).count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s rows=$n%-9d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("toks", split(col("text"), " "))
    val sh = docs.filter(size(col("toks")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        """transform(sequence(1, size(toks)-2),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i+1),
          |              ' ', element_at(toks, i+2)))""".stripMargin)).as("shs"))
    time("shingles")(sh.count())
    val ex = sh.select(col("doc_id"), explode(col("shs")).as("sh"))
    time("explode")(ex.count())
    val hashed = ex.select(col("doc_id") +: (0 until 8).map { j =>
      md5(concat(lit(s"$j|"), col("sh")).cast("binary")).as(s"h$j")
    }: _*)
    time("md5x8")(hashed.count())
    val sigs = for (j <- 0 until 8; c <- 0 until 4) yield
      min(substring(col(s"h$j"), c * 8 + 1, 8)).as(s"m${j}_$c")
    val sig = hashed.groupBy("doc_id").agg(sigs.head, sigs.tail: _*)
    time("signatures")(sig.count())
    val bandCols = (0 until 8).map { j =>
      struct(lit(j).as("band"),
        md5(concat_ws(",", (0 until 4).map(c => col(s"m${j}_$c")): _*)
          .cast("binary")).as("bkey"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    time("bands")(bands.count())
    val a = bands.select(col("doc_id").as("a_id"), col("band"), col("bkey"))
    val b = bands.select(col("doc_id").as("b_id"), col("band"), col("bkey"))
    val cand = a.join(b, Seq("band", "bkey")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    time("candidates")(cand.count())
    val sa = sh.select(col("doc_id").as("a_id"), col("shs").as("a_s"))
    val sb = sh.select(col("doc_id").as("b_id"), col("shs").as("b_s"))
    val out = cand.join(sa, "a_id").join(sb, "b_id")
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_s"), col("b_s"))) /
         size(array_distinct(concat(col("a_s"), col("b_s"))))).as("j"))
    time("verified")(out.count())
    spark.stop()
  }
}
