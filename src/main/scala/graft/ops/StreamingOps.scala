package graft.ops

import graft.streaming.EventStream

/** Streaming entries in the query surface. st01 runs a REAL
  * Structured Streaming query (readStream → watermark → windowed agg
  * → memory sink, AvailableNow trigger) whose final result is
  * oracle-checked against the same SQL as the batch path — the
  * unified-API guarantee, made checkable.
  */
object StreamingOps {

  val all: Seq[Q] = Seq(
    Q(
      "st01_stream_hourly",
      (s, dir) => EventStream.runHourly(s, dir),
      Some("""
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
          COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2"""))
  )
}
