package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Event-time windowing over `events`. The same `window()` /
  * `session_window()` expressions run unchanged under Structured Streaming
  * (see Streams.scala); here they run in batch so the DuckDB oracle can
  * check them.
  */
object StreamingQueries {
  def defs: Seq[Q] = Seq(
    // ---- tumbling 1-hour event-time window.
    Q("q33_tumbling_hour",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
          .select(col("window.start").as("w_start"), col("event_type"),
            col("n"), col("sum_value"))
          .orderBy("w_start", "event_type"),
      Some(s"""WITH ${Tables.evCte}
              SELECT date_trunc('hour', ts) AS w_start, event_type,
              count(*) AS n, round(sum(value),4) AS sum_value
              FROM ev GROUP BY 1, 2 ORDER BY w_start, event_type""")),

    // ---- sliding 30-min window, 15-min slide (each event lands in 2
    // windows; windows align to the epoch, matching Spark's window()).
    Q("q34_sliding_30m",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "30 minutes", "15 minutes"))
          .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
          .select(col("window.start").as("w_start"), col("n"), col("sum_value"))
          .orderBy("w_start"),
      Some(s"""WITH ${Tables.evCte},
              win AS (SELECT make_timestamp(
                        (epoch_us(ts) - epoch_us(ts) % 900000000) - k * 900000000) AS w_start,
                      value
                      FROM ev CROSS JOIN (SELECT unnest([0, 1]) AS k) ks
                      WHERE epoch_us(ts) - ((epoch_us(ts) - epoch_us(ts) % 900000000) - k * 900000000)
                            < 1800000000)
              SELECT w_start, count(*) AS n, round(sum(value),4) AS sum_value
              FROM win GROUP BY 1 ORDER BY w_start""")),

    // ---- session windows (30-min inactivity gap) per user; identical
    // semantics to session_window(ts, '30 minutes'): a gap of exactly 30
    // minutes starts a NEW session (windows are half-open).
    Q("q35_session_window",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("sum_value"))
          .select(col("session_window.start").as("w_start"), col("user_id"),
            col("n_events"), col("sum_value"))
          .orderBy("user_id", "w_start"),
      Some(s"""WITH ${Tables.evCte},
              g AS (SELECT user_id, ts, value,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                     THEN 1 ELSE 0 END AS is_new FROM ev
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              sess AS (SELECT user_id, ts, value,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g)
              SELECT min(ts) AS w_start, user_id, count(*) AS n_events,
                     round(sum(value),4) AS sum_value
              FROM sess GROUP BY user_id, sid ORDER BY user_id, w_start""")),

    // ---- q103: batch twin of the CUSTOM-STATE streaming path. The SAME
    // flatMapGroupsWithState function that runs incrementally under the
    // state store in StreamsSpec (and its transformWithState twin,
    // parity-asserted there) runs here in batch mode — each group
    // visited once with empty initial state — so the per-user (n, total)
    // produced by the stateful code path is oracle-checkable in DuckDB.
    Q("q103_running_totals_state",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
            col("user_id"), col("event_type"), col("value"))
          .as[Streams.EventRow]
        Streams.runningTotals(ev).toDF()
          .select(col("user_id"), col("n"), round(col("total"), 4).as("total"))
          .orderBy("user_id")
      },
      Some(s"""WITH ${Tables.evCte}
              SELECT user_id, count(*) AS n, round(sum(value), 4) AS total
              FROM ev GROUP BY 1 ORDER BY user_id""")),

    // ---- q123: batch twin of the streaming dedup leg
    // (Streams.dedupStream / dropDuplicatesWithinWatermark, state
    // behavior pinned in StreamsSpec). Streaming dedup keeps the first
    // ARRIVAL per key — undefined in batch — so the declared batch
    // rule is the deterministic keep-earliest-(ts, event_id) via one
    // struct-min aggregation (the q99 keep-rule on the events table).
    // The logical dedup key coarsens value to floor(value) — the
    // telemetry replay/at-least-once shape where payloads re-arrive
    // slightly re-serialized (and the synthetic table has no exact
    // double collisions at small SF). Output: each duplicated key with
    // the surviving row and the multiplicity. One hash shuffle on the
    // dedup key, map-side combined; never a window over all events.
    Q("q123_event_dedup",
      (s, d) =>
        Tables.events(s, d)
          .withColumn("vkey", floor(col("value")).cast("long"))
          .groupBy(col("user_id"), col("event_type"), col("vkey"))
          .agg(min(struct(col("ts"), col("event_id"))).as("m"),
            count(lit(1)).as("n_dups"))
          .filter(col("n_dups") > 1)
          .select(col("user_id"), col("event_type"), col("vkey"),
            col("m.event_id").as("kept_event_id"),
            col("m.ts").cast("timestamp_ntz").as("kept_ts"),
            col("n_dups"))
          .orderBy("user_id", "event_type", "vkey"),
      Some(s"""WITH ${Tables.evCte},
              g AS (SELECT user_id, event_type,
                      CAST(floor(value) AS BIGINT) AS vkey,
                      min(struct_pack(ts := ts, event_id := event_id)) AS m,
                      count(*) AS n_dups
                    FROM ev GROUP BY 1, 2, 3)
              SELECT user_id, event_type, vkey,
                     m.event_id AS kept_event_id, m.ts AS kept_ts, n_dups
              FROM g WHERE n_dups > 1
              ORDER BY user_id, event_type, vkey"""))
  ) ++ Seq(

    // ---- q107: batch twin of the STREAM-STREAM interval join
    // (Streams.clickToPurchase): the same function runs on batch
    // frames (EliminateEventTimeWatermark drops the watermark nodes),
    // so the pairing semantics — each click joined to same-user
    // purchases within the following hour, both bounds inclusive — are
    // oracle-checked while StreamsSpec pins the streaming state
    // behavior. Timestamps cast to ltz for the event-time join (the
    // session runs UTC) and back to ntz for the output so both engines
    // hash naive microsecond wall clocks.
    Q("q107_click_to_purchase",
      (s, d) => {
        val ev = Tables.events(s, d)
          .withColumn("ts", col("ts").cast("timestamp"))
        graft.streaming.Streams.clickToPurchase(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"))
          .select(col("user_id"), col("click_id"),
            col("click_ts").cast("timestamp_ntz").as("click_ts"),
            col("purchase_id"),
            col("purchase_ts").cast("timestamp_ntz").as("purchase_ts"))
          .orderBy("user_id", "click_id", "purchase_id")
      },
      Some(s"""WITH ${Tables.evCte},
              c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
                    FROM ev WHERE event_type = 'click'),
              p AS (SELECT user_id AS p_uid, event_id AS purchase_id,
                      ts AS purchase_ts
                    FROM ev WHERE event_type = 'purchase')
              SELECT user_id, click_id, click_ts, purchase_id, purchase_ts
              FROM c JOIN p ON user_id = p_uid
                AND purchase_ts >= click_ts
                AND purchase_ts <= click_ts + INTERVAL 1 HOUR
              ORDER BY user_id, click_id, purchase_id"""))
  )
}
