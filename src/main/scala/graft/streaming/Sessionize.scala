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
  case class State(lastUs: Long, nSessions: Long, nEvents: Long)
  case class PerUser(user_id: Long, n_sessions: Long, n_events: Long)

  /** Running per-user session/event counts, emitted on every update. */
  def sessions(events: Dataset[Event], gapUs: Long): Dataset[PerUser] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[State, PerUser](OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[State]) =>
          var st = state.getOption.getOrElse(State(0L, 0L, 0L))
          it.toArray.sortBy(_.us).foreach { e =>
            val newSession = st.nEvents == 0L || e.us - st.lastUs > gapUs
            st = State(e.us, st.nSessions + (if (newSession) 1L else 0L), st.nEvents + 1L)
          }
          state.update(st)
          Iterator(PerUser(uid, st.nSessions, st.nEvents))
      }
  }
}
