package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-28 gates (SURVEY §2.28). */
class Round9acSpec extends SparkSpec {

  test("ts_rolling_wau: window accumulates and forgets exactly") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(id: Long, day: Int, u: Long) =
      (id, Timestamp.valueOf(f"2024-01-${day}%02d 10:00:00"), u, "click",
        1.0, "{}")
    // u1 active day 1; u2 active day 5; u3 active day 12
    val events = Seq(ev(1, 1, 100L), ev(2, 5, 200L), ev(3, 12, 300L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.QRound9ac.rollingWau(events).collect()
      .map(r => r.getAs[Long]("day_num") -> r.getAs[Long]("wau")).toMap
    val d1 = out.keys.min // day of Jan 1
    // Jan 1..4: only u1. Jan 5..7: u1 (still in window) + u2.
    assert(out(d1) === 1L)
    assert(out(d1 + 4) === 2L)
    // Jan 8..11: u1 expired (window [2..8] has u2 only from day 5)
    assert(out(d1 + 7) === 1L)
    // Jan 12: u3 only (u2 expired Jan 12: window [6..12])
    assert(out(d1 + 11) === 1L)
    // clipping: no day past the last activity day
    assert(out.keys.max === d1 + 11)
  }

  test("text_sentence_stats: planted sentences split exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "One two three. Four five! Six seven eight nine?", "en", "s", 0L),
      (2L, "No terminator here", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.QRound9ac.sentenceStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sents"), r.getAs[Long]("n_words"),
          r.getAs[Long]("max_sent_words"))).toMap
    assert(out(1L) === ((3L, 9L, 4L)))
    assert(out(2L) === ((1L, 3L, 3L)))
  }

  test("fn_stable_id: identity is content-derived and collision-aware") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same text", "s1", "en", 0L), (2L, "same text", "s1", "en", 0L),
      (3L, "same text", "s2", "en", 0L))
      .map { case (id, txt, src, l, n) => (id, txt, l, src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.QRound9ac.stableId(docs).collect()
    val byDoc = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("stable_id"), r.getAs[Long]("n_dup"))).toMap
    // same (source, text) -> same id, collision group of 2
    assert(byDoc(1L)._1 === byDoc(2L)._1)
    assert(byDoc(1L)._2 === 2L)
    // different source -> different id even for identical text
    assert(byDoc(3L)._1 !== byDoc(1L)._1)
    assert(byDoc(3L)._2 === 1L)
    // canonical UUID shape
    assert(byDoc(1L)._1.matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
  }

  test("wave-28 keys registered with oracles") {
    Seq("ts_rolling_wau", "text_sentence_stats", "fn_stable_id")
      .foreach { k =>
        assert(SparkEntry.queries.contains(k), s"$k not registered")
        assert(SparkEntry.oracleSql.contains(k), s"$k has no oracle")
      }
  }
}
