package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.EventOps.asofJoin]]: temporal
  * enrichment of an event stream with the most recent reference update
  * at or before each event's time (stream-stream; a slowly-changing
  * reference feed is just a sparse stream).
  *
  * Spark's built-in stream joins cannot express as-of ("latest right
  * <= ts", a per-event argmax), so this is custom state-store logic via
  * `flatMapGroupsWithState` — the (c)-tier justification of SURVEY §7.
  * Both inputs are unioned into one keyed tick stream; per key the
  * state buffers (a) events not yet matured past the watermark and
  * (b) reference updates still matchable. An event is emitted exactly
  * once, when the watermark passes its timestamp — at that point no
  * late reference update inside the delay can change its match, so
  * results equal the batch asofJoin on the same data (spec-pinned
  * parity). Enrichment is LEFT: an event with no update at or before
  * it emits null ref columns.
  *
  * Bounded state, the 100 TB contract: per key, events live only until
  * the watermark passes them, and of the updates at or before the
  * watermark only the LATEST is kept (it alone can match future
  * events) — everything older is pruned each invocation. State is
  * O(active keys * (in-flight events + updates inside the horizon)).
  *
  * Streaming-only by design: in batch mode the watermark is absent, so
  * nothing matures — use `EventOps.asofJoin` on landed tables (that
  * pairing is the same twin pattern as Sessionize / EventOps
  * .sessionize).
  */
object StreamAsof {

  case class Event(key: Long, ts: Timestamp, value: Double)
  case class Update(key: Long, ts: Timestamp, ref: Double)

  /** Internal union envelope (public: the encoder's generated code
    * needs JVM access to the constructor). */
  case class Tick(key: Long, ts: Timestamp, is_event: Boolean, v: Double)

  case class AsofState(
      events: Vector[(Long, Double)], updates: Vector[(Long, Double)])

  case class Enriched(
      key: Long, ts: Timestamp, value: Double,
      ref_ts: Option[Timestamp], ref: Option[Double])

  /** Enrich `events` with the latest `updates` row per key at or
    * before each event time. `delay` is the shared watermark (bounds
    * both lateness tolerance and state size). */
  def enrich(events: Dataset[Event], updates: Dataset[Update],
      delay: String): Dataset[Enriched] = {
    val spark = events.sparkSession
    import spark.implicits._
    implicit val stateEnc = Encoders.product[AsofState]
    implicit val outEnc = Encoders.product[Enriched]
    val ticks = events.toDF()
      .select(col("key"), col("ts"), lit(true).as("is_event"), col("value").as("v"))
      .unionByName(updates.toDF()
        .select(col("key"), col("ts"), lit(false).as("is_event"), col("ref").as("v")))
      .withWatermark("ts", delay)
      .as[Tick]
    ticks
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, Enriched](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[Tick], state: GroupState[AsofState]) =>
          val st = state.getOption.getOrElse(AsofState(Vector.empty, Vector.empty))
          val (newEv, newUp) = it.toVector.partition(_.is_event)
          val evs = st.events ++ newEv.map(t => (t.ts.getTime, t.v))
          val ups = (st.updates ++ newUp.map(t => (t.ts.getTime, t.v))).sortBy(_._1)
          val wm = state.getCurrentWatermarkMs()
          // Matured events: the watermark guarantees their reference
          // horizon is complete, so the as-of match is final.
          val (ready, pending) = evs.partition(_._1 <= wm)
          val out = ready.sortBy(_._1).map { case (t, v) =>
            val m = ups.takeWhile(_._1 <= t).lastOption
            Enriched(key, new Timestamp(t), v,
              m.map(x => new Timestamp(x._1)), m.map(_._2))
          }
          // Prune: of the updates at or before the watermark only the
          // latest can ever match again.
          val cut = ups.lastIndexWhere(_._1 <= wm)
          val keptUps = if (cut <= 0) ups else ups.drop(cut)
          if (pending.isEmpty && keptUps.isEmpty) state.remove()
          else {
            state.update(AsofState(pending, keptUps))
            // Wake when the earliest in-flight event matures (strictly
            // above the current watermark by construction of `pending`).
            if (pending.nonEmpty) state.setTimeoutTimestamp(pending.map(_._1).min)
          }
          out.iterator
      }
  }
}
