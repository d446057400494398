package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming sessionization via `flatMapGroupsWithState` — the
  * stateful counterpart of the batch `q11_sessionize` window query (gap-based
  * sessions: a new session starts when a user's inter-event gap exceeds
  * `gapUs`).
  *
  * State per user is three longs (last event time, session count, event
  * count) — constant-size regardless of history, so state storage scales
  * with |users|, not |events|. Events are sorted within each micro-batch
  * group (batches are small); cross-batch order is carried by the state's
  * last-event timestamp, so chunked time-ordered arrival (the append-log
  * shape) reproduces the batch answer exactly.
  */
object Sessionize {

  case class Event(user_id: Long, us: Long)
  case class State(lastUs: Long, nSessions: Long, nEvents: Long, nLate: Long)
  case class PerUser(user_id: Long, n_sessions: Long, n_events: Long, n_late: Long)

  /** Running per-user session/event counts, emitted on every update.
    *
    * Cross-batch order matters: an event arriving in a LATER micro-batch
    * with `us < lastUs` cannot retroactively split an already-emitted
    * session, so it is folded into the current one — but it must neither
    * regress the session clock (lastUs stays monotone via max) nor pass
    * silently: `n_late` counts these arrivals, so divergence from the batch
    * window answer is observable instead of assumed away.
    */
  def sessions(events: Dataset[Event], gapUs: Long): Dataset[PerUser] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[State, PerUser](OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[State]) =>
          var st = state.getOption.getOrElse(State(0L, 0L, 0L, 0L))
          it.toArray.sortBy(_.us).foreach { e =>
            val late = st.nEvents > 0L && e.us < st.lastUs
            val newSession = st.nEvents == 0L || e.us - st.lastUs > gapUs
            st = State(math.max(st.lastUs, e.us),
              st.nSessions + (if (newSession) 1L else 0L),
              st.nEvents + 1L,
              st.nLate + (if (late) 1L else 0L))
          }
          state.update(st)
          Iterator(PerUser(uid, st.nSessions, st.nEvents, st.nLate))
      }
  }
}
