package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Third tranche of relational operators: time-series densification
  * and other gaps the first two tranches left.
  */
object Relational3 {

  private def t(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Gap-filled hourly counts (q61) — time-series densification, the
    * resample step every monitoring/feature pipeline needs: hours with
    * no events must appear with n = 0, which no plain groupBy can
    * produce. Shape: the corpus-scale work is ONE map-side-combining
    * groupBy (event_type, hour); the calendar spine is generated from
    * a 1-row min/max aggregate via `sequence` (span-hours × types
    * rows — bounded by wall-clock time and cardinality, NOT corpus
    * size, so it stays tiny at 100 TB) and broadcast; the fill join is
    * spine LEFT JOIN counts on the tiny spine side. Nothing re-reads
    * events twice: the trunc'd projection is computed once and feeds
    * counts, span, and the type dimension.
    */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val ev = events.select(
      date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
    val counts = ev.groupBy("event_type", "hour_ts")
      .agg(count(lit(1)).as("n_obs"))
    val span = ev.agg(min(col("hour_ts")).as("h0"),
      max(col("hour_ts")).as("h1"))
    val hours = span.select(
      explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour_ts"))
    val types = ev.select("event_type").distinct()
    broadcast(hours).crossJoin(broadcast(types))
      .join(counts, Seq("event_type", "hour_ts"), "left")
      .select(col("event_type"), col("hour_ts"),
        coalesce(col("n_obs"), lit(0L)).as("n"))
      .orderBy("event_type", "hour_ts")
  }

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    Q(
      "q61_gap_fill",
      (s, dir) => gapFillHourly(t(s, dir)("events")),
      Some("""
        WITH ev AS (
          SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_ts,
            event_type
          FROM events),
        counts AS (
          SELECT event_type, hour_ts, COUNT(*) AS n_obs
          FROM ev GROUP BY 1, 2),
        span AS (
          SELECT MIN(hour_ts) AS h0, MAX(hour_ts) AS h1 FROM ev),
        hours AS (
          SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
            AS hour_ts
          FROM span),
        types AS (SELECT DISTINCT event_type FROM ev)
        SELECT t.event_type, h.hour_ts, COALESCE(c.n_obs, 0) AS n
        FROM hours h CROSS JOIN types t
        LEFT JOIN counts c
          ON c.event_type = t.event_type AND c.hour_ts = h.hour_ts
        ORDER BY t.event_type, h.hour_ts"""))
  )
}
