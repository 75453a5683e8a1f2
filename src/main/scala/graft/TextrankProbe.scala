package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables._

/** A/B probe: textrank pair-edge generation — per-shared-token join
  * (old) vs per-sentence token-set intersect (new). Dev tool. */
object TextrankProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = t(spark, d, "documents")
    docs.agg(count(lit(1))).collect() // warm the scan
    val toks = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "tok")
      .withColumn("sent", expr("pos div 25"))
      .select(col("doc_id"), col("sent"), col("tok")).distinct()
    def tsec(tag: String)(f: => Unit): Unit = {
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime(); f
        println(f"TR $tag%-20s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    tsec("old_token_join") {
      toks.join(
          toks.select(col("doc_id"), col("sent").as("sent_b"), col("tok")),
          Seq("doc_id", "tok"))
        .filter(col("sent") < col("sent_b"))
        .groupBy("doc_id", "sent", "sent_b")
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 3)
        .write.format("noop").mode("overwrite").save()
    }
    tsec("new_set_intersect") {
      val sents = toks.groupBy("doc_id", "sent")
        .agg(collect_set(col("tok")).as("tks"))
      sents.join(
          sents.select(col("doc_id"), col("sent").as("sent_b"),
            col("tks").as("tks_b")), Seq("doc_id"))
        .filter(col("sent") < col("sent_b"))
        .filter(size(array_intersect(col("tks"), col("tks_b"))) >= 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
