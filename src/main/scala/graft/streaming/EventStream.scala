package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A10/A11: event-stream analytics.
  *
  * The watermarked window agg is the streaming twin of the batch
  * `q_time_bucket`; sessionization is `flatMapGroupsWithState` with
  * per-user session state. Both are bounded-state: watermark discards
  * late buckets, session state is one small record per active user.
  */
object EventStream {

  /** Watermarked tumbling-window aggregation (A10). `events` may be a
    * streaming or batch DataFrame with (ts, event_type, value).
    */
  def windowedAgg(events: DataFrame, window_ : String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("n"), col("sum_value"))

  /** A10c: windowed APPROXIMATE distinct users via the HllDistinct
    * sketch aggregate — sketches compose with streaming state exactly
    * like sums (mergeable partials), so per-window distinct counts
    * stay O(2^p) memory per window instead of per-key state; the
    * scale answer to COUNT(DISTINCT) over an unbounded stream.
    */
  def windowedApproxUsers(events: DataFrame, window_ : String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_))
      .agg(graft.functions.hll_distinct(col("user_id")).as("approx_users"),
        count(lit(1)).as("n_events"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("approx_users"), col("n_events"))

  /** A15: streaming deduplication — drop repeated event_ids with
    * bounded state: `dropDuplicatesWithinWatermark` keeps each key
    * only until the watermark passes it (exactly-once delivery over
    * an at-least-once transport, the Kafka-consumer reality the
    * reference handles by idempotent Kudu upserts
    * [ref: KuduManager.scala:72]).
    */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream join: each purchase joined to the same user's
    * clicks in the preceding hour. Watermarks bound both join-state
    * buffers (Spark drops click state older than purchase watermark -
    * 1h); in batch mode the same function is the range join, which is
    * what the spec compares against.
    */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
  }

  /** A11c: the same sessionization on Spark 4's `transformWithState`
    * — the arbitrary-state API that replaces flatMapGroupsWithState
    * (typed per-key state handles, timer support, RocksDB-backed
    * state with changelog checkpointing). Semantics are kept
    * IDENTICAL to [[sessionize]] (the spec pins tws == fmgws ==
    * batch), so the two APIs are drop-in interchangeable here; new
    * deployments should prefer this one — per-state-variable
    * handles and event-time timers compose where GroupState cannot.
    * Requires the RocksDB state store provider (see the spec for the
    * session conf).
    */
  class TwsSessionizer(gapMinutes: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, SessionEvent, SessionOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var st: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[SessionEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionOut] = {
      val (next, closed) = foldSessions(uid, Option(st.get()), rows, gapMinutes)
      next.foreach(st.update)
      closed.iterator
    }
  }

  def twsSessionize(events: Dataset[SessionEvent], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .groupByKey(_.user_id)
      .transformWithState(new TwsSessionizer(gapMinutes),
        TimeMode.None(), OutputMode.Append())
  }

  case class SessionEvent(user_id: Long, ts: Timestamp, event_id: Long)
  case class SessionOut(user_id: Long, session_start: String, session_end: String,
                        n_events: Long)
  case class SessionState(startUs: Long, lastUs: Long, n: Long)

  private def fmt(us: Long): String = {
    val t = new Timestamp(us / 1000)
    new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss") {
      setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    }.format(t)
  }

  /** A11: gap-based sessionization. Emits every *closed* session; the
    * open tail session per user stays in state (in batch mode, where
    * state starts empty and is processed once, the last session of
    * each user is therefore withheld — tests account for this).
    */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val (next, closed) = foldSessions(uid, state.getOption, it, gapMinutes)
          next.foreach(state.update)
          closed.iterator
      }
  }

  /** The ONE session fold both stateful APIs run (fmgws above, tws'
    * TwsSessionizer) — shared so the spec-pinned tws == fmgws
    * equivalence can't drift through a one-sided edit. Returns the
    * open tail state (to store) and the closed sessions (to emit).
    */
  private def foldSessions(uid: Long, prev: Option[SessionState],
      rows: Iterator[SessionEvent], gapMinutes: Int)
      : (Option[SessionState], Seq[SessionOut]) = {
    val gapUs = gapMinutes * 60L * 1000000L
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    var cur = prev
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      val us = e.ts.getTime * 1000L
      cur match {
        case Some(s) if us - s.lastUs <= gapUs =>
          cur = Some(s.copy(lastUs = us, n = s.n + 1))
        case Some(s) =>
          closed += SessionOut(uid, fmt(s.startUs), fmt(s.lastUs), s.n)
          cur = Some(SessionState(us, us, 1))
        case None =>
          cur = Some(SessionState(us, us, 1))
      }
    }
    (cur, closed.result())
  }
}
