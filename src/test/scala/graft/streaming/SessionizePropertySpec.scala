package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.sql.Timestamp
import scala.util.Random

/** Property test for sessionization on DEGENERATE timestamps: gaps drawn
  * to straddle the 1800s boundary at millisecond precision (1799999,
  * 1800000, 1800001 ms), zero gaps, duplicate timestamps with distinct
  * event ids. Three formulations must agree event-for-event:
  *
  *  1. an in-memory reference fold (the spec's oracle),
  *  2. the batch window formulation (epoch-ms lag + running sum — the
  *     ms-precise sibling of q_win_sessionize, whose seconds-grain form
  *     is DuckDB-oracle-checked by the driver),
  *  3. `Streaming.sessionize` (flatMapGroupsWithState) in batch mode.
  *
  * Locks in the cross-engine precision semantics: a session breaks iff
  * the ms gap is >= 1800000 — never "about 30 minutes".
  */
class SessionizePropertySpec extends SparkSpec {
  import spark.implicits._

  private val GapMs = 1800000L

  /** In-memory reference: fold sorted events into sessions. */
  private def referenceSessions(
      evts: Seq[Streaming.Event]): Set[(Long, Long, Long, Int, Double)] =
    evts.groupBy(_.user_id).flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Int, Double)]
      var start, last = 0L; var n = 0; var sum = 0.0
      for (e <- sorted) {
        val t = e.ts.getTime
        if (n == 0 || t - last >= GapMs) {
          if (n > 0) sessions += ((uid, start, last, n, sum))
          start = t; last = t; n = 1; sum = e.value
        } else { last = math.max(last, t); n += 1; sum += e.value }
      }
      if (n > 0) sessions += ((uid, start, last, n, sum))
      sessions
    }.toSet

  test("degenerate ms gaps at the 1800s boundary: window formulation ≡ stateful streaming ≡ reference") {
    val rnd = new Random(20260812)
    // gap menu clusters on the boundary; a couple of clean values mixed in
    val gaps = Seq(0L, 1L, 499L, 1799999L, 1800000L, 1800001L, 3600000L)
    for (trial <- 1 to 10) {
      var nextId = 0L
      val evts = (1L to 4L).flatMap { uid =>
        var t = 1700000000000L + rnd.nextInt(1000)
        (1 to 40).map { _ =>
          t += gaps(rnd.nextInt(gaps.length))
          nextId += 1
          Streaming.Event(nextId, new Timestamp(t), uid, "e", (nextId % 7).toDouble)
        }
      }
      val expected = referenceSessions(evts)

      // (2) batch window formulation at ms grain: lag + running session
      // counter, then roll up to sessions
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val windowed = evts.toDS.toDF()
        .withColumn("ms", unix_millis($"ts"))
        .withColumn("gap_ms", $"ms" - lag($"ms", 1).over(w))
        .withColumn("seq",
          sum(when($"gap_ms".isNull || $"gap_ms" >= GapMs, 1).otherwise(0))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"seq")
        .agg(min($"ms").as("s"), max($"ms").as("e"),
          count(lit(1)).cast("int").as("n"), sum($"value").as("sv"))
        .select($"user_id", $"s", $"e", $"n", $"sv")
        .as[(Long, Long, Long, Int, Double)].collect().toSet
      assert(windowed == expected, s"window formulation diverged (trial $trial)")

      // (3) flatMapGroupsWithState in batch mode (emitTrailing flushes
      // the open session, since batch never fires timeouts)
      val streamed = Streaming
        .sessionize(evts.toDS, java.time.Duration.ofMillis(GapMs), emitTrailing = true)
        .select($"user_id", unix_millis($"session_start"), unix_millis($"session_end"),
          $"n_events", $"sum_value")
        .as[(Long, Long, Long, Int, Double)].collect().toSet
      assert(streamed == expected, s"stateful formulation diverged (trial $trial)")
    }
  }
}
