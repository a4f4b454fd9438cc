package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, MapState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key event row fed to the transformWithState processors. */
case class TwsEvent(user_id: Long, ts_us: Long, event_id: Long, event_type: String)

/** [[TwsOps.keepLastN]] emission: the kept window tagged with the monotone
  * per-key input total `n_seen` — the latest emission per key is the one
  * with the largest tag, so the drained sink dedups batching-independently
  * (the w5 argmax rule applied to a SET-valued emission). */
case class TwsKept(user_id: Long, ts_us: Long, event_id: Long,
    event_type: String, n_seen: Long)

/** [[TwsOps.typeCounts]] emission: current per-(key, type) running count. */
case class TwsTypeCount(user_id: Long, event_type: String, n: Long)

/** Event row for the EVENT-TIME-mode processors: `ts` is the watermarked
  * timestamp column (transformWithState in TimeMode.EventTime requires a
  * watermark on the input), `ts_us` the exact epoch-µs long the outputs
  * surface (rule 1: results never expose raw timestamps). */
case class TwsTimedEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)

/** [[TwsOps.idleExpiry]] emission, fired by the EVENT-TIME TIMER when a key
  * goes idle: its last event time and lifetime count at expiry. */
case class TwsExpiry(user_id: Long, last_us: Long, n_events: Long)

/** The reference's per-key stores re-expressed on Spark 4's
  * `transformWithState` arbitrary-state API (StatefulProcessor + typed
  * ValueState/ListState/MapState over the RocksDB state store) — the
  * modern replacement for the map/flatMapGroupsWithState shapes in
  * [[StatefulOps]], covering the same contract as the reference's
  * KVStoreLocal per-key structures (core KVStore.scala:107-129) with
  * Spark-managed state instead of an embedded store.
  *
  * Scale shape: state is per-key and bounded by construction (a ≤N-element
  * list, a type-cardinality map, one long) — RocksDB keeps it off-heap, so
  * key cardinality is disk-bounded, not memory-bounded; emissions are
  * state-sized, never history-sized.
  *
  * Both emissions are BATCHING-INDEPENDENT under replay: counts are
  * monotone per (key, type) so `max(n)` over the drained sink is the final
  * register regardless of how the log split into micro-batches, and the
  * keep-last-N window rides the monotone `n_seen` tag (latest emission =
  * largest tag). Neither query needs the w5 single-batch assertion. */
object TwsOps {

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** transformWithState requires the RocksDB state store; scope the
    * provider switch to one query build+drain and restore the session's
    * previous provider after (other streaming queries in the same Verify/
    * Bench JVM keep their default HDFS-backed store). */
  def withRocksDb[T](s: SparkSession)(f: => T): T = {
    val prev = s.conf.getOption(ProviderKey)
    s.conf.set(ProviderKey, RocksProvider)
    try f
    finally prev match {
      case Some(v) => s.conf.set(ProviderKey, v)
      case None    => s.conf.unset(ProviderKey)
    }
  }

  /** Keep-last-N per key as transformWithState ListState — the streaming
    * form of the reference's keep-last-N CDC listener (R8, q7): state is
    * the current ≤N-element window ordered by (ts_us, event_id), merged
    * and re-trimmed on every arrival batch.
    *
    * `ttl` is Spark 4's NATIVE state TTL (the reference's per-store TTL
    * config, StateConf.java:30-31 / read-side expiry MemStore.java:140-154,
    * on the managed-state path): both the window ListState and the
    * lifetime counter expire `ttl` of PROCESSING time after their last
    * write — an idle key's window and count reset, exactly the read-side
    * expiry rule (state the store hasn't touched for TTL reads as absent).
    * TTLConfig.NONE keeps the w22 keep-forever behavior. */
  private class KeepLastNProcessor(n: Int, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, TwsEvent, TwsKept] {
    @transient private var kept: ListState[TwsEvent] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      kept = getHandle.getListState[TwsEvent]("kept",
        Encoders.product[TwsEvent], ttl)
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong, ttl)
    }

    override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
        timerValues: TimerValues): Iterator[TwsKept] = {
      val incoming = rows.toVector
      val merged = (kept.get().toVector ++ incoming)
        .sortBy(e => (e.ts_us, e.event_id)).takeRight(n)
      kept.put(merged.toArray)
      val total = (if (seen.exists()) seen.get() else 0L) + incoming.size
      seen.update(total)
      merged.iterator.map(e =>
        TwsKept(key, e.ts_us, e.event_id, e.event_type, total))
    }
  }

  def keepLastN(ev: Dataset[TwsEvent], n: Int): Dataset[TwsKept] = {
    implicit val keptEnc: org.apache.spark.sql.Encoder[TwsKept] =
      Encoders.product[TwsKept]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new KeepLastNProcessor(n),
        TimeMode.None(), OutputMode.Append())
  }

  /** [[keepLastN]] with NATIVE state TTL (w33): Spark requires
    * TimeMode.ProcessingTime when any state is TTL'd — with no timers
    * registered the per-batch semantics are otherwise identical to the
    * TimeMode.None form, plus the read-side expiry of idle keys' state. */
  def keepLastNTtl(ev: Dataset[TwsEvent], n: Int,
      ttl: java.time.Duration): Dataset[TwsKept] = {
    implicit val keptEnc: org.apache.spark.sql.Encoder[TwsKept] =
      Encoders.product[TwsKept]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new KeepLastNProcessor(n, TTLConfig(ttl)),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Running per-(key, event_type) counts as transformWithState MapState —
    * the J10 stateful-count shape with the type dimension INSIDE one key's
    * state (the reference's per-key record maps) instead of widening the
    * grouping key. Emits the key's full current map on each arrival batch;
    * counts are monotone, so `max(n)` over the drain is the final state. */
  private class TypeCountProcessor
      extends StatefulProcessor[Long, TwsEvent, TwsTypeCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
        timerValues: TimerValues): Iterator[TwsTypeCount] = {
      rows.foreach { e =>
        val cur =
          if (counts.containsKey(e.event_type)) counts.getValue(e.event_type)
          else 0L
        counts.updateValue(e.event_type, cur + 1L)
      }
      counts.iterator().map { case (t, c) => TwsTypeCount(key, t, c) }
    }
  }

  def typeCounts(ev: Dataset[TwsEvent]): Dataset[TwsTypeCount] = {
    implicit val tcEnc: org.apache.spark.sql.Encoder[TwsTypeCount] =
      Encoders.product[TwsTypeCount]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new TypeCountProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Idle-key expiry on EVENT-TIME TIMERS — the session-timeout /
    * abandoned-cart shape: each arrival batch reschedules the key's single
    * timer to (last event + gap); when the event-time watermark passes it,
    * `handleExpiredTimer` fires once with the key's final (last_us,
    * n_events). State is two longs + one timer per key; emission happens
    * ONLY at expiry, so output is idle-key-sized, never event-sized. */
  private class IdleExpiryProcessor(gapMs: Long)
      extends StatefulProcessor[Long, TwsTimedEvent, TwsExpiry] {
    @transient private var lastSeen: ValueState[Long] = _
    @transient private var nSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lastSeen = getHandle.getValueState[Long]("last",
        Encoders.scalaLong, TTLConfig.NONE)
      nSeen = getHandle.getValueState[Long]("n",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[TwsTimedEvent],
        timerValues: TimerValues): Iterator[TwsExpiry] = {
      var last = if (lastSeen.exists()) lastSeen.get() else Long.MinValue
      var n = if (nSeen.exists()) nSeen.get() else 0L
      rows.foreach { e =>
        if (e.ts_us > last) last = e.ts_us
        n += 1L
      }
      lastSeen.update(last)
      nSeen.update(n)
      // one live timer per key: reschedule to the NEW last + gap (timer
      // registry is in epoch ms; last_us floor-divides exactly)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(last / 1000L + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[TwsExpiry] =
      Iterator.single(TwsExpiry(key, lastSeen.get(), nSeen.get()))
  }

  def idleExpiry(ev: Dataset[TwsTimedEvent], gapMs: Long): Dataset[TwsExpiry] = {
    implicit val exEnc: org.apache.spark.sql.Encoder[TwsExpiry] =
      Encoders.product[TwsExpiry]
    ev.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new IdleExpiryProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
