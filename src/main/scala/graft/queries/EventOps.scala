package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QuerySpec, Tables}

/** The reference's relational query surface (SURVEY §2.3, §2.5, §2.6) re-expressed
  * over the driver's `events` stream table.
  *
  * Reference semantics carried over:
  *  - time windows are anchored at the newest row's event time, not wall clock
  *    (`/root/reference/thisishappening/app.py:401-447`) — here the anchor is a
  *    1-row broadcast aggregate, never a driver-side collect;
  *  - `event_type IN (...) OR event_type IS NULL` filter shape
  *    (`data_base.py:109-113`);
  *  - keep-newest-N retention (`data_base.py:464-482`) becomes
  *    `TakeOrderedAndProject` (per-partition top-k + k-row merge) instead of the
  *    reference's fetch-all-ids scan — the shape that survives 100 TB;
  *  - per-user exponential decay weighting (`data_utils.py:91-145`): within a
  *    user, rows sorted by event time ascending, weight(i) = 1/exp(i·factor).
  */
object EventOps {

  private def eventsWithAnchor(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    ev.crossJoin(broadcast(ev.agg(max(col("ts")).as("anchor_ts"))))
  }

  /** Q1/Q5: time-range scan + type-or-null filter + ORDER BY ts DESC
    * (`data_base.py:307-382, 90-116`).
    */
  val qRecentEvents: QuerySpec = QuerySpec(
    "q10_recent_events",
    (s, d) =>
      // Hash materialization boundary BELOW the global sort (guide §2.4, the
      // q42-r21 pattern): the range partitioner's sampling pass executes the
      // sort's entire child once before the real shuffle executes it again,
      // and here that child is the full events scan + anchor join + filter —
      // the r21 repartitionByRange rewrite did NOT change that (its exchange
      // had the same child; flagged as cosmetic by the r21 audit). With the
      // filtered rows first hash-exchanged on event_id, the sampling pass
      // re-reads that (small, 24 h window) shuffle output instead of
      // re-scanning the table: one scan at any scale, and the extra exchange
      // carries only the filtered window.
      eventsWithAnchor(s, d)
        .filter(
          col("ts") >= col("anchor_ts") - expr("INTERVAL 24 HOURS") &&
            (col("event_type").isin("click", "view") || col("event_type").isNull),
        )
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .repartition(col("event_id"))
        .orderBy(col("ts").desc, col("event_id")),
    Some("""
      SELECT event_id, ts, user_id, event_type, value
      FROM events
      WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOUR
        AND (event_type IN ('click', 'view') OR event_type IS NULL)
      ORDER BY ts DESC, event_id
    """.stripMargin.trim),
  )

  /** Q2: windowed count per type (`data_base.py:276-305`). */
  val qCountWindow: QuerySpec = QuerySpec(
    "q11_count_events_window",
    (s, d) =>
      eventsWithAnchor(s, d)
        .filter(col("ts") >= col("anchor_ts") - expr("INTERVAL 72 HOURS"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("event_type")),
    Some("""
      SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
      FROM events
      WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 72 HOUR
      GROUP BY event_type
      ORDER BY event_type
    """.stripMargin.trim),
  )

  /** Q3: oldest row — `orderBy(asc).limit(1)` → TakeOrderedAndProject
    * (`data_base.py:384-399`).
    */
  val qOldest: QuerySpec = QuerySpec(
    "q12_oldest_event",
    (s, d) =>
      Tables
        .events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .orderBy(col("ts"), col("event_id"))
        .limit(1),
    Some("""
      SELECT event_id, ts, user_id, event_type, value
      FROM events ORDER BY ts, event_id LIMIT 1
    """.stripMargin.trim),
  )

  /** Q4/Q6: newest row (`data_base.py:401-416, 118-130`). */
  val qNewest: QuerySpec = QuerySpec(
    "q13_newest_event",
    (s, d) =>
      Tables
        .events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(1),
    Some("""
      SELECT event_id, ts, user_id, event_type, value
      FROM events ORDER BY ts DESC, event_id DESC LIMIT 1
    """.stripMargin.trim),
  )

  /** Q9/W2: keep-newest-N retention as scalable top-k
    * (`data_base.py:464-482`).
    */
  val qKeepN: QuerySpec = QuerySpec(
    "q14_keep_n_rows",
    (s, d) =>
      Tables
        .events(s, d)
        .select(col("event_id"), col("ts"))
        .orderBy(col("ts").desc, col("event_id").desc)
        .limit(1000),
    Some("""
      SELECT event_id, ts
      FROM events ORDER BY ts DESC, event_id DESC LIMIT 1000
    """.stripMargin.trim),
  )

  /** Q8: age-based retention — rows that survive `ts >= anchor − 7 days`,
    * summarized per day (`data_base.py:430-462`).
    */
  val qRetention: QuerySpec = QuerySpec(
    "q15_retention_cutoff",
    (s, d) =>
      eventsWithAnchor(s, d)
        .filter(col("ts") >= col("anchor_ts") - expr("INTERVAL 7 DAYS"))
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("day")),
    Some("""
      SELECT date_trunc('day', ts) AS day, count(*) AS n_kept
      FROM events
      WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 7 DAY
      GROUP BY day
      ORDER BY day
    """.stripMargin.trim),
  )

  /** A11/W1: per-user exponential decay weight (`data_utils.py:91-145`):
    * rows ranked by event time ascending within each user;
    * weight = 1/exp((rank−1)·factor), earliest row = 1.0.
    * One shuffle on user_id; the window never crosses users so it scales
    * with the user-key cardinality, not data volume.
    */
  val qUserDecay: QuerySpec = QuerySpec(
    "q16_user_activity_decay",
    // One exchange total (was two + a range-sample re-execution of the window
    // stage): the window's required distribution (clustered by user_id) and
    // ordering (user_id, ts, event_id) are established with a single RANGE
    // exchange + in-partition sort, which simultaneously IS the output order —
    // (user_id, rn) ≡ (user_id, ts, event_id) because rn ranks by (ts,
    // event_id) within user_id. Range partitioning keeps equal user_ids in one
    // partition, so the window never crosses partitions; the trailing
    // orderBy(user_id, rn) exchange+sort disappears (guide §2.4: window keyed
    // like a neighboring operation shares one exchange).
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables
        .events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"))
        // Explicit count so AQE cannot coalesce the range exchange to one
        // partition and serialize the window (see Tables.shufflePartitions).
        .repartitionByRange(Tables.shufflePartitions(s), col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .select(
          col("event_id"),
          col("user_id"),
          col("rn"),
          round(lit(1.0) / exp((col("rn") - lit(1)) * lit(0.05)), 6).as("weight"),
        )
    },
    Some("""
      SELECT event_id, user_id, rn,
             round(1.0 / exp((rn - 1) * 0.05), 6) AS weight
      FROM (SELECT event_id, user_id,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events)
      ORDER BY user_id, rn
    """.stripMargin.trim),
  )

  /** A5: mode with deterministic first-wins tie-break
    * (`tweet_utils.py:564-583`; tie-break per SURVEY §7.4.4).
    * Explicit `asc_nulls_last` on the tie-break key: Spark's default asc puts
    * NULLs first while DuckDB puts them last, so a count tie involving the
    * NULL event_type would otherwise flip the winning row between engines.
    */
  val qMode: QuerySpec = QuerySpec(
    "q17_event_type_mode",
    (s, d) =>
      Tables
        .events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type").asc_nulls_last)
        .limit(1),
    Some("""
      SELECT event_type, count(*) AS n
      FROM events GROUP BY event_type
      ORDER BY n DESC, event_type ASC NULLS LAST LIMIT 1
    """.stripMargin.trim),
  )

  /** J1/Q7: correlated range lookup — for each anchor row, aggregate the rows
    * inside its trailing 1 h window (`data_base.py:132-155`). The anchor side
    * is tiny by construction → broadcast; Spark plans BroadcastNestedLoopJoin
    * for the theta condition, which is exactly right when one side is k rows.
    */
  val qRangeJoin: QuerySpec = QuerySpec(
    "q18_event_window_lookup",
    (s, d) => {
      val ev = Tables.events(s, d)
      val anchors = ev
        .filter(col("event_type") === "purchase")
        .orderBy(col("value").desc, col("event_id"))
        .limit(5)
        .select(col("event_id").as("anchor_id"), col("ts").as("anchor_ts"))
      ev.join(
          broadcast(anchors),
          col("ts") >= col("anchor_ts") - expr("INTERVAL 1 HOUR") &&
            col("ts") <= col("anchor_ts"),
        )
        .groupBy(col("anchor_id"))
        .agg(count(lit(1)).as("n_in_window"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("anchor_id"))
    },
    Some("""
      WITH anchors AS (
        SELECT event_id AS anchor_id, ts AS anchor_ts
        FROM events WHERE event_type = 'purchase'
        ORDER BY value DESC, event_id LIMIT 5
      )
      SELECT anchor_id, count(*) AS n_in_window, round(sum(value), 4) AS sum_value
      FROM events JOIN anchors
        ON ts >= anchor_ts - INTERVAL 1 HOUR AND ts <= anchor_ts
      GROUP BY anchor_id
      ORDER BY anchor_id
    """.stripMargin.trim),
  )

  /** W3/ST2: tumbling hourly windows with previous-window comparison
    * (`app.py:401-447`) — the batch shape of the reference's curr-vs-prev
    * activity windows.
    */
  val qSlidingWindows: QuerySpec = QuerySpec(
    "q19_hourly_window_lag",
    (s, d) => {
      val hourly = Tables
        .events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("window_start"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      hourly
        .withColumn("prev_n", lag(col("n"), 1).over(Window.orderBy(col("window_start"))))
        .orderBy(col("window_start"))
    },
    Some("""
      SELECT window_start, n, sum_value,
             lag(n, 1) OVER (ORDER BY window_start) AS prev_n
      FROM (SELECT date_trunc('hour', ts) AS window_start,
                   count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1)
      ORDER BY window_start
    """.stripMargin.trim),
  )

  /** F18: JSON field navigation over the `props` payload
    * (`tweet_utils.py:95-178` defensive nested access → `get_json_object`).
    */
  val qJsonExtract: QuerySpec = QuerySpec(
    "q20_json_props",
    (s, d) =>
      Tables
        .events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k")),
    Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n
      FROM events GROUP BY k ORDER BY k
    """.stripMargin.trim),
  )

  val all: Seq[QuerySpec] = Seq(
    qRecentEvents,
    qCountWindow,
    qOldest,
    qNewest,
    qKeepN,
    qRetention,
    qUserDecay,
    qMode,
    qRangeJoin,
    qSlidingWindows,
    qJsonExtract,
  )
}
