package graft

import graft.operators.Events
import graft.queries.QHelpers
import org.apache.spark.sql.functions._

/** Event-time operator invariants. */
class EventsSpec extends SparkSpec {

  private def events = QHelpers.t(spark, sf, "events")

  test("sessionize and session_window agree") {
    val a = Events.sessionize(events, gapMinutes = 30)
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .orderBy("user_id", "session_start").collect()
    val b = Events.sessionWindows(events, "30 minutes")
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .orderBy("user_id", "session_start").collect()
    assert(a.length == b.length)
    assert(a.sameElements(b))
  }

  test("session event counts partition the table") {
    val total = Events.sessionize(events, 30)
      .agg(sum("n_events")).collect().head.getLong(0)
    assert(total == events.count())
  }

  test("asofJoin matches a naive per-row computation") {
    val purchases = events.filter(col("event_type") === "purchase").limit(200)
    val signups = events.filter(col("event_type") === "signup")
    val got = Events.asofJoin(purchases, signups, "user_id", "ts", Seq("event_id"))
      .select("event_id", "asof_ts").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    val sign: Map[Long, Seq[java.sql.Timestamp]] = signups.select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sortBy(_.getTime) }
    purchases.select("event_id", "user_id", "ts").collect().foreach { r =>
      val expected = sign.getOrElse(r.getLong(1), Seq.empty[java.sql.Timestamp])
        .filter(!_.after(r.getTimestamp(2))).lastOption
      assert(got(r.getLong(0)) == expected,
        s"event ${r.getLong(0)}: got ${got(r.getLong(0))}, want $expected")
    }
  }
}
