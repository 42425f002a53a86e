package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom streaming state via `mapGroupsWithState` (the API for semantics
 * the built-in streaming aggregates can't express): a per-key running
 * (row count, xor-of-hash) lineage checksum over an event stream — the
 * streaming twin of the batch `bit_xor(xxhash64(...))` lineage metric
 * (plans/Lineage.scala), usable to verify that a streaming ingest saw
 * exactly the rows the batch job saw.
 *
 * The state monoid is commutative (sum + xor), so the emitted checksum is
 * independent of batch boundaries and arrival order — streaming == batch
 * EXACTLY, which the spec asserts. State per key is two longs (bounded);
 * keys shuffle-partition evenly when the key is a hash.
 */
object StreamingState {

  final case class KeyChecksum(key: Long, n: Long, xor: Long)

  /** Running (count, xor(hash64)) per key over a stream with columns
    * (key LONG, h LONG). Update mode: emits the new state each batch. */
  def checksums(keyed: DataFrame): Dataset[KeyChecksum] = {
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed.select(col("key").cast("long"), col("h").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          var (n, x) = state.getOption.getOrElse((0L, 0L))
          rows.foreach { case (_, h) => n += 1; x ^= h }
          state.update((n, x))
          KeyChecksum(key, n, x)
      }
  }

  final case class SessionAssign(userId: Long, eventId: Long, sessionId: Long)

  /** Streaming gap-based sessionization via `flatMapGroupsWithState` —
    * the streaming twin of q_d4_sessionize (new session after `gapUs`
    * microseconds of inactivity). State per user is two longs (last event
    * time, running session ordinal). Events must arrive per-user in event
    * -time order across batches for exact batch parity (a time-ordered
    * replay — the standard contract for session state without a reorder
    * buffer; out-of-order arrivals within one batch are sorted here, and
    * production would add a watermark-sized buffer in the same slot). */
  def sessionize(events: DataFrame, gapUs: Long): Dataset[SessionAssign] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"),
        col("event_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          var (lastTs, session) = state.getOption.getOrElse((Long.MinValue, 0L))
          val out = rows.toSeq.sortBy(r => (r._3, r._2)).map { case (_, eid, t) =>
            if (lastTs == Long.MinValue || t - lastTs > gapUs) session += 1
            lastTs = t
            SessionAssign(user, eid, session)
          }
          state.update((lastTs, session))
          out.iterator
      }
  }

  /** The batch reference: same checksum via one aggregation. */
  def checksumsBatch(keyed: DataFrame): DataFrame =
    keyed.groupBy(col("key"))
      .agg(count("*").as("n"),
        expr("bit_xor(h)").as("xor"))

  /** OutputMode the sink must use for [[checksums]]. */
  val outputMode: OutputMode = OutputMode.Update()
}
