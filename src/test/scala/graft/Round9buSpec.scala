package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamOps

/** Round-9 wave-72 gates (SURVEY §2.28). */
class Round9buSpec extends SparkSpec {

  private def ev(id: Long, t: String, user: Long): Ev =
    Ev(id, Timestamp.valueOf(t), user, "click", 1.0, "{}")

  test("stream_rate_alert: append-mode stream == batch, only offenders") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val burst = (1 to 6).map(i => ev(i, f"2024-01-01 10:0$i:00", 7L))
    val calm = Seq(ev(10, "2024-01-01 11:00:00", 8L),
      ev(11, "2024-01-01 12:00:00", 8L))
    val fence = Seq(ev(99, "2024-01-04 00:00:00", 9L))
    val ms = MemoryStream[Ev]
    val q = StreamOps.rateAlert(ms.toDF())
      .writeStream.format("memory").queryName("ralert")
      .outputMode("append").start()
    ms.addData(burst ++ calm)
    q.processAllAvailable()
    ms.addData(fence) // advance watermark past Jan 1 so windows emit
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ralert")
      .orderBy("day_start", "user_id").collect()
    assert(streamed.length === 1)
    assert(streamed.head.getAs[Long]("user_id") === 7L)
    assert(streamed.head.getAs[Long]("n") === 6L)
    // batch twin on the same data agrees on the emitted day
    val batch = StreamOps.rateAlert((burst ++ calm ++ fence).toDF())
      .orderBy("day_start", "user_id").collect()
    assert(batch.toSeq === streamed.toSeq)
  }

  test("stream_rate_alert on driver data: every alert exceeds the limit") {
    val out = SparkEntry.queries("stream_rate_alert")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("n") > 5))
  }

  test("agg_cohens_kappa: confusion sums to n, kappa <= agreement bound") {
    val out = SparkEntry.queries("agg_cohens_kappa")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val n = r.getAs[Long]("n")
    assert(r.getAs[Long]("yy") + r.getAs[Long]("yn")
      + r.getAs[Long]("ny") + r.getAs[Long]("nn") === n)
    val po = r.getAs[Double]("observed_agreement")
    val k = r.getAs[Double]("cohens_kappa")
    assert(po >= 0.0 && po <= 1.0)
    assert(k >= -1.0 && k <= 1.0)
    assert(k <= po + 1e-9) // kappa never exceeds raw agreement
  }

  test("emb_ari_nmi: scores bounded, clustering nontrivial") {
    val out = SparkEntry.queries("emb_ari_nmi")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") === 500L)
    assert(r.getAs[Long]("n_cells") > 1)
    assert(r.getAs[Long]("n_labels") === 10L)
    val ari = r.getAs[Double]("ari")
    val nmi = r.getAs[Double]("nmi")
    assert(ari >= -0.5 && ari <= 1.0)
    assert(nmi >= 0.0 && nmi <= 1.0001)
  }
}
