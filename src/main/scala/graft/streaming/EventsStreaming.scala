package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipelines over the `events` schema — the
  * streaming twins of graft.operators.Events' batch queries (absent from
  * the reference, SURVEY.md §2.11; built on watermarks + windows +
  * mapGroupsWithState only — no custom state store).
  *
  * Scale: state is keyed by (window, event_type) / (user, session) /
  * user respectively; watermarks bound state size, and Spark shards the
  * state store by key hash across executors.
  */
object EventsStreaming {

  /** Tumbling 10-minute counts per event_type; 1-hour watermark drops
    * late data deterministically (batch twin: Events.tumblingWindow). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Session windows with a 30-minute gap per user (batch twin:
    * Events.sessionize's lag+cumsum formulation). */
  def sessionized(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"))

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserStats(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via mapGroupsWithState: per-user running totals
    * (the KeyValueGroupedDataset state API the reference has no analog
    * for). */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(user, 0L, 0.0))
          val batch = it.toSeq
          val next = UserStats(user, prev.n_events + batch.size,
            prev.total_value + batch.map(_.value).sum)
          state.update(next)
          next
      }
  }

  final case class RawEvent(event_id: Long, user_id: Long,
      event_type: String, ts: java.sql.Timestamp)
  final case class Attribution(event_id: Long, user_id: Long,
      purchase_ts: java.sql.Timestamp, last_click_ts: Option[java.sql.Timestamp])

  /** Streaming as-of join (click→purchase attribution) via
    * flatMapGroupsWithState: per-user state holds the latest click
    * timestamp; each purchase emits its most recent strictly-prior
    * click — the streaming twin of operators.Events.asofJoin. State is
    * one timestamp per user, sharded by key. Events must arrive
    * time-ordered per user within a batch (the memory-stream test
    * harness and any per-key-ordered source satisfy this; out-of-order
    * arrivals would need a watermark + buffer like Spark's own
    * stream-stream interval join). */
  def clickAttribution(events: Dataset[RawEvent]): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Attribution](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, it, state: GroupState[Long]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Attribution]
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            if (e.event_type == "purchase")
              out += Attribution(e.event_id, e.user_id, e.ts,
                state.getOption.map(new java.sql.Timestamp(_)))
            if (e.event_type == "click")
              state.update(e.ts.getTime)
          }
          out.iterator
      }
  }

  final case class FunnelUpdate(user_id: Long, stage: Int, ts: java.sql.Timestamp)

  /** Streaming conversion funnel (twin of operators.Events.funnel):
    * per-user state is three epoch-millis slots (view, click, purchase;
    * -1 = unfilled); each stage completion emits an append row. Greedy
    * in-order transitions reproduce the batch semantics exactly —
    * earliest view, first strictly-later click, first strictly-later
    * purchase — under the same per-user time-ordered arrival contract
    * as [[clickAttribution]]. State is 24 bytes per user, sharded by
    * key hash. */
  def funnelStages(events: Dataset[RawEvent]): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), FunnelUpdate](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[(Long, Long, Long)]) =>
          var (tv, tc, tp) = state.getOption.getOrElse((-1L, -1L, -1L))
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelUpdate]
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val t = e.ts.getTime
            e.event_type match {
              case "view" if tv < 0 =>
                tv = t; out += FunnelUpdate(user, 1, e.ts)
              case "click" if tv >= 0 && tc < 0 && t > tv =>
                tc = t; out += FunnelUpdate(user, 2, e.ts)
              case "purchase" if tc >= 0 && tp < 0 && t > tc =>
                tp = t; out += FunnelUpdate(user, 3, e.ts)
              case _ =>
            }
          }
          state.update((tv, tc, tp))
          out.iterator
      }
  }

  /** Streaming exact dedup on event_id with a watermark bounding the
    * dedup state (the streaming face of operators.Dedup's exact path). */
  def dedupEvents(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id")

  /** Convenience: run a streaming frame to completion against a memory
    * sink and return the sink table (test/demo harness). */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
