package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.ops.D.{dbl, m}

/** Structured Streaming over the `events` table.
  *
  * The reference is pure batch (SURVEY.md §1.3); the stream
  * capability is the north-star extension. Spark's unified API means
  * the windowed-aggregation TRANSFORMATION is one function used by
  * both the batch query surface (q22) and the real streaming path
  * here — the only difference is readStream + watermark + trigger.
  *
  * Scale: file-source streaming shards by file; watermark bounds
  * state (1h windows + 1h lateness ⇒ ≤2h of open windows per key);
  * `mapGroupsWithState` state lives in the state store, partitioned
  * by key — the same code runs on a 1000-executor cluster with
  * checkpointing to durable storage.
  */
object EventStream {

  /** Post-repair schema — what st08's file sink holds. Read-back needs
    * it explicitly: an empty source stream writes NO parquet files, and
    * schema inference on an empty directory throws. Layout-independent:
    * whatever the on-disk ts encoding, `Tables.repairEventsTs`
    * normalises the stream to exactly this shape.
    */
  val repairedSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Shared transformation: hourly tumbling windows per event_type.
    * Works identically on a batch DataFrame or a streaming one.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dbl(sum(m(col("value")))).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Run `f` with `spark.sql.shuffle.partitions` temporarily lowered:
    * a stateful streaming query pins its state-store partition count
    * from this conf at FIRST start, and every micro-batch then pays a
    * per-partition store commit across every stateful operator (a
    * stream-stream join keeps 4 stores per partition). For the
    * bounded-cardinality state these queries carry, 8 partitions is
    * plenty of parallelism and ~4× less commit overhead than the
    * session's batch setting. A real deployment sizes this to
    * state-rows/partition, not to the batch shuffle width.
    * (`private[graft]`: ScaleSmoke's stream modes need the same
    * discipline — a 32-partition state store commits 4× the stores to
    * hold the same ~100 rows.)
    */
  private[graft] def withStreamShufflePartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try f finally spark.conf.set(key, prev)
  }

  /** Pin the micro-batch DISCOVERY ORDER of a sliced file feed:
    * FileStreamSource orders unseen files by modification time with
    * unspecified tie-breaking, so two slice files written within one
    * filesystem clock tick could be picked up out of slice order —
    * fatal to any operator whose oracle argument needs "earlier
    * commit ⟺ smaller slice" (st35/st36; st32/st33/st34's oracles
    * are order-independent). Each slice directory's data files get
    * an explicitly strictly increasing lastModified (2 s apart —
    * far above any filesystem's timestamp granularity).
    */
  private[graft] def pinSliceOrder(input: String, slices: Int): Unit = {
    val t0 = System.currentTimeMillis()
    for (i <- 0 until slices) {
      // Both slice-directory conventions: s<i> (per-slice filtered
      // writes) and slice=<i> ([[writeSlices]]' partitionBy layout).
      Seq(s"$input/s$i", s"$input/slice=$i")
        .map(new java.io.File(_)).filter(_.exists())
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
        .filter(_.getName.endsWith(".parquet"))
        .foreach { f =>
          require(f.setLastModified(t0 + i * 2000L),
            s"could not pin mtime on $f")
        }
    }
  }

  /** Write a sliced feed as one file per slice in ONE distributed job
    * (r19 — previously every streaming op paid a localCheckpoint plus
    * one filtered write job PER SLICE): repartitioning BY the slice
    * value puts each slice wholly into one task, and partitionBy
    * writes it as a single file under `slice=<i>/`. An EMPTY slice
    * writes no directory under partitionBy, but the streams' cadence
    * arguments need exactly `slices` micro-batches (st36's oracle
    * restates the refresh eras by batch index; the per-slice filtered
    * writes produced an empty file for an empty slice), so missing
    * slices get an explicit empty single-file commit. Discovery order
    * is always mtime-pinned ([[pinSliceOrder]]) — previously only
    * st35/st36 pinned and the rest relied on sequential-write mtimes
    * (the r18 ADVICE tie-break hazard); one job makes ties the norm,
    * so the pin comes with the helper.
    */
  /** Total bytes of parquet data files under `d` (recursive, driver
    * side, no Spark job) — the size hint the in-stream graph
    * refreshes feed Graph.cpKeyed's partition sizing.
    */
  private[graft] def dirParquetBytes(d: java.io.File): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else if (f.getName.endsWith(".parquet")) f.length()
      else 0L
    walk(d)
  }

  private[graft] def writeSlices(sliced: DataFrame, slices: Int,
      input: String): Unit = {
    val spark = sliced.sparkSession
    val dataSchema = org.apache.spark.sql.types.StructType(
      sliced.schema.filterNot(_.name == "slice"))
    sliced.repartition(col("slice"))
      .write.partitionBy("slice").mode("overwrite").parquet(input)
    for (i <- 0 until slices) {
      val d = new java.io.File(s"$input/slice=$i")
      if (!d.exists())
        spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            dataSchema)
          .coalesce(1).write.mode("overwrite")
          .parquet(d.getAbsolutePath)
    }
    pinSliceOrder(input, slices)
  }

  /** Latest total state-store row count reported by `q`'s (single)
    * stateful operator, or -1 before any stateful progress — the one
    * progress-sampling idiom shared by the ScaleSmoke stream modes and
    * EventStreamSpec's state-bound assertion. `numRowsTotal` sums over
    * partitions, so the value is partition-count-independent.
    */
  private[graft] def lastStateRows(
      q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.filter(_.stateOperators.nonEmpty)
      .lastOption.map(_.stateOperators.head.numRowsTotal).getOrElse(-1L)

  /** Read the memory-sink table, order it, and DROP the temp view:
    * DataFrame analysis is eager, so the returned plan keeps the sink
    * data alive while referenced — but without the drop every run
    * would pin a full result set in the session catalog for the JVM
    * lifetime (Bench executes each streaming query twice per run).
    */
  private def drainMemoryTable(
      spark: SparkSession, name: String, order: String*): DataFrame = {
    val out = spark.table(name).orderBy(order.map(col): _*)
    spark.catalog.dropTempView(name)
    out
  }

  /** File-source stream over the events parquet. The stream schema is
    * derived from the parquet footer via the same adaptive path as the
    * batch loader (`Tables.eventsOnDiskSchema` + `repairEventsTs`), so
    * a testdata layout change can never make the stream read a
    * different clock than the batch queries the oracle checks against.
    */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    val onDisk = graft.Tables.eventsOnDiskSchema(spark, dir)
    // File stream sources want a directory; select just the events
    // file out of the sf dir via glob filter.
    graft.Tables.repairEventsTs(
      spark.readStream
        .schema(onDisk)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** Run the hourly aggregation as a REAL streaming query (AvailableNow
    * trigger, complete mode, memory sink) and return the final result.
    * Complete mode emits every window, so the result equals the batch
    * run bit-for-bit — which is exactly what the DuckDB oracle checks.
    */
  /** Shared transformation for st24: q70's HOPPING windows — each
    * event updates its wd/sd = 3 covering 15-minute window states
    * (the streaming Expand), aggregates merge per (window, type).
    * Identical on batch and stream; the oracle IS batch q70.
    */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "15 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dbl(sum(m(col("value")))).as("total"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total"))

  /** Run the hopping-window aggregation as a REAL streaming query
    * over the events file stream (st24) — state is one row per LIVE
    * (window, type): bounded by the wall-clock span the watermark
    * keeps open × fan-out 3 × type cardinality, never by the stream.
    */
  def runHopping(spark: SparkSession, dir: String): DataFrame = {
    val name =
      "st_hopping_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamShufflePartitions(spark, 8) {
      val q = hoppingCounts(readStream(spark, dir))
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Complete())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainMemoryTable(spark, name, "window_start_us", "event_type")
  }

  def runHourly(spark: SparkSession, dir: String): DataFrame = {
    val name = "st_hourly_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamShufflePartitions(spark, 8) {
      val q = hourlyCounts(readStream(spark, dir))
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Complete())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainMemoryTable(spark, name, "hour", "event_type")
  }

  /** Run the flatMapGroupsWithState sessionization as a REAL streaming
    * query over the events file stream and return the emitted (closed)
    * sessions. Sessions close two ways: a later event of the same user
    * arrives ≥ 30 min after the previous one (gap rule), or the
    * EventTimeTimeout fires once the watermark passes last-seen +
    * 30 min — emitting AND EVICTING the session, so no user's state
    * lives forever (the r9 NoTimeout leak). The batch-SQL oracle is
    * "every session except each user's last, plus the last where
    * last_ms + 30 min < final watermark" — watermark semantics stated
    * in SQL (final watermark = floor(max µs / 1000) ms − 1 h, timeout
    * fires on strict <, Spark's eviction rule).
    */
  def runSessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = "st_sessions_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // The watermarked ts column must survive into the stateful
    // operator's input (Spark's EventTimeTimeout requirement) — SEv
    // carries it alongside the µs value the gap arithmetic uses.
    val evs = readStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("ts"))
      .as[SEv]
    withStreamShufflePartitions(spark, 8) {
      val q = sessionize(evs)
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainMemoryTable(spark, name, "user_id", "n_events")
  }

  /** Run the watermarked stream-stream interval join as a REAL
    * streaming query (purchases ⋈ views of the same user in the
    * preceding hour, both sides branches of the same file stream) and
    * return the match pairs. Inner-join matches emit in the
    * micro-batch they occur, so AvailableNow over one file yields the
    * full batch-join result — which is exactly what the oracle SQL
    * states.
    */
  def runIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val name = "st_ssjoin_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val ev = readStream(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    withStreamShufflePartitions(spark, 8) {
      val q = purchasesWithRecentViews(p, v)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"), col("view_event_id"), col("view_ts"))
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainMemoryTable(spark, name, "purchase_id", "view_event_id")
  }

  /** st26: the LEFT OUTER stream-stream interval join — st03's inner
    * join answers "which views preceded this purchase"; the outer
    * variant answers the question attribution actually asks: EVERY
    * purchase, view-attributed or provably organic. Structured
    * Streaming cannot emit the null row when the purchase arrives (a
    * matching view may still come); it emits it from the join state
    * only once the watermark proves no admissible view remains —
    * i.e. wm ≥ purchase ts, where wm is the MIN of both sides'
    * watermarks (Spark's multi-watermark policy) with event times
    * floored to ms (st13's pinned rule). Purchases younger than the
    * final watermark stay in state and emit NOTHING — the oracle
    * states that gate explicitly, which is what makes this row a real
    * check of watermark-driven null emission rather than a batch left
    * join in disguise.
    *
    * Scale shape: state is bounded on both sides by the 1 h condition
    * bound + 1 h lateness — eviction is the same keyed range cleanup
    * as the inner join, and null emission piggybacks on it. No
    * unbounded buffers at any rate.
    */
  def runIntervalJoinOuter(spark: SparkSession, dir: String): DataFrame = {
    val name = "st_ssjoin_o_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val ev = readStream(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    withStreamShufflePartitions(spark, 8) {
      val q = purchasesWithRecentViews(p, v, joinType = "left_outer")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"), col("view_event_id"), col("view_ts"))
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainMemoryTable(spark, name, "purchase_id", "view_event_id")
  }

  /** Run sessionization with Spark's NATIVE `session_window` operator
    * as a REAL streaming query — the compose-existing-ops counterpart
    * to [[sessionize]]'s custom flatMapGroupsWithState: merging
    * session windows are a built-in stateful aggregation (state-store
    * backed, watermark-evicted), so a per-user event count per session
    * needs no hand-written state machine at all. Same 30-min gap rule:
    * `session_window(ts, g)` spans [ts, ts+g) and merges overlapping
    * spans, so a gap of exactly g starts a new session — identical to
    * [[sessionize]]'s `>= gapUs` break. Append mode emits only
    * sessions FINALIZED by the watermark (window end at or before the
    * final watermark), which the oracle states directly.
    */
  def runSessionWindows(spark: SparkSession, dir: String): DataFrame = {
    val name = "st_sesswin_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamShufflePartitions(spark, 8) {
      val q = readStream(spark, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("n_events"))
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainMemoryTable(spark, name, "user_id", "session_start")
  }

  /** Run streaming dedup (`dropDuplicatesWithinWatermark`) as a REAL
    * streaming query: first occurrence of each (user_id, event_type)
    * passes, later ones are dropped, and key state is evicted once the
    * watermark passes — bounded memory, the scale requirement for
    * streaming dedup. Only the KEY columns are emitted (which survivor
    * row wins inside a micro-batch is not deterministic; the key set
    * is), so the oracle is the batch DISTINCT.
    */
  def runStreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val name = "st_dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamShufflePartitions(spark, 8) {
      val q = readStream(spark, dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainMemoryTable(spark, name, "user_id", "event_type")
  }

  /** Run a stream-static enrichment join as a REAL streaming query:
    * the events stream joins the static `customer` dimension
    * (broadcast — the canonical 100 TB shape: the stream is unbounded,
    * the dim is small and map-side), then aggregates per (segment,
    * event_type). The static side is re-read every micro-batch by
    * Structured Streaming's contract, so dimension updates between
    * batches are picked up for free. Complete mode over the bounded
    * group cardinality; AvailableNow over one file ⇒ result equals the
    * batch join bit-for-bit.
    */
  def runStaticEnriched(spark: SparkSession, dir: String): DataFrame = {
    val name = "st_static_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val cust = graft.Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    withStreamShufflePartitions(spark, 8) {
      val q = readStream(spark, dir)
        .join(broadcast(cust), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"), dbl(sum(m(col("value")))).as("sum_value"))
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Complete())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainMemoryTable(spark, name, "c_mktsegment", "event_type")
  }

  /** Run the `mapGroupsWithState` running counts as a REAL streaming
    * query. Update mode emits one state row per (user, micro-batch);
    * counts are monotone, so the final per-user count is the MAX over
    * emitted rows — which must equal the batch GROUP BY count.
    */
  def runRunningCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = "st_counts_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val evs = readStream(spark, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"))
      .as[Ev]
    withStreamShufflePartitions(spark, 8) {
      val q = runningCounts(evs)
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Update())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val out = spark.table(name)
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"))
      .orderBy("user_id")
    spark.catalog.dropTempView(name)
    out
  }

  /** Write one micro-batch to its OWN directory, atomically replacing
    * any previous attempt — the idempotent-file-sink pattern that
    * gives foreachBatch end-to-end exactly-once on retries: a batch
    * that fails mid-write and re-runs overwrites its directory instead
    * of appending duplicates. Factored out so the spec can replay a
    * batch and assert the sink is unchanged.
    */
  def writeBatchIdempotent(
      batch: DataFrame, batchId: Long, outDir: String): Unit =
    batch.write.mode("overwrite")
      .parquet(s"$outDir/batch_id=$batchId")

  /** Run the production file-sink path as a REAL streaming query:
    * foreachBatch → per-batch idempotent parquet write → read the sink
    * back and aggregate. The memory-sink queries check operator
    * semantics; this one checks the DELIVERY contract (what lands in
    * storage), which is what a 100 TB pipeline actually consumes
    * downstream. AvailableNow over one file ⇒ the sink holds exactly
    * the source rows, so the oracle is the plain batch aggregate.
    */
  def runForeachBatchSink(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.ops.SourceSinks.tmp("graft_st08").getAbsolutePath
    withStreamShufflePartitions(spark, 8) {
      val q = readStream(spark, dir)
        .writeStream
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
          writeBatchIdempotent(batch, id, out)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.schema(repairedSchema).parquet(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), dbl(sum(m(col("value")))).as("sum_value"))
      .orderBy("event_type")
  }

  /** Run CHAINED stateful operators in one streaming query (the
    * Spark 3.4+ multiple-stateful-operator surface): an hourly
    * windowed aggregation feeding a daily re-aggregation, Append
    * mode. Append emits only FINALIZED windows — those whose end is
    * at or before the final watermark (max event time − 1h) — so the
    * oracle states exactly that: the batch daily rollup restricted to
    * days closed by the watermark. This is the honest production
    * semantics of a chained windowed pipeline, made checkable.
    */
  def runTwoLevelWindow(spark: SparkSession, dir: String): DataFrame = {
    val name = "st_twolevel_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamShufflePartitions(spark, 8) {
      val hourly = readStream(spark, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val daily = hourly
        .groupBy(window(col("window"), "1 day"), col("event_type"))
        .agg(sum(col("n")).cast("long").as("n"))
        .select(col("window.start").as("day"), col("event_type"), col("n"))
      val q = daily
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainMemoryTable(spark, name, "day", "event_type")
  }

  /** Run the per-window top-k as a REAL streaming query (see
    * [[windowTopK]]): top-3 users by event count per hourly tumbling
    * window, emitted once the watermark finalizes the window.
    */
  def runWindowTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = "st_wintopk_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val evs = readStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("ts"))
      .as[SEv]
    withStreamShufflePartitions(spark, 8) {
      val q = windowTopK(evs, k = 3)
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainMemoryTable(spark, name, "window_start", "rnk")
  }

  // ------------------------------------------------------------------
  // Custom state: running per-user counts via mapGroupsWithState.
  // ------------------------------------------------------------------

  final case class Ev(event_id: Long, user_id: Long, us: Long)

  /** Sessionization input: like [[Ev]] but carrying the watermarked
    * `ts` column itself — Spark's EventTimeTimeout check requires the
    * watermark ATTRIBUTE (not just the node) to reach the
    * flatMapGroupsWithState input, so it cannot be projected away.
    * `us` duplicates ts at µs precision for the gap arithmetic.
    */
  final case class SEv(
      event_id: Long, user_id: Long, us: Long, ts: java.sql.Timestamp)
  final case class UserCount(user_id: Long, n_events: Long)
  final case class Session(user_id: Long, n_events: Long, closed: Boolean)

  /** Arbitrary stateful streaming: per-user running event counts.
    * State (one Long per user) lives in the state store and survives
    * across micro-batches — see EventStreamSpec for the two-batch
    * accumulation proof.
    */
  def runningCounts(ds: Dataset[Ev]): Dataset[UserCount] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .mapGroupsWithState[Long, UserCount](GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + evs.size
          state.update(n)
          UserCount(user, n)
      }
  }

  /** Stream-stream interval join: purchases enriched with any view by
    * the same user in the preceding hour. Both sides are watermarked,
    * and the join condition bounds event-time distance, so each side's
    * buffered state is evicted once the watermark passes — the
    * requirement for an unbounded stream-stream join.
    */
  def purchasesWithRecentViews(
      purchases: DataFrame, views: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val p = purchases.withWatermark("ts", "1 hour")
    val v = views
      .withColumnRenamed("ts", "view_ts")
      .withColumnRenamed("user_id", "view_user")
      .withColumnRenamed("event_id", "view_event_id")
      .withWatermark("view_ts", "1 hour")
    p.join(v,
      col("user_id") === col("view_user") &&
        col("view_ts") <= col("ts") &&
        col("view_ts") >= col("ts") - expr("INTERVAL 1 HOUR"),
      joinType)
  }

  final case class WindowTopUser(
      window_start: java.sql.Timestamp, user_id: Long, n_events: Long,
      rnk: Int)

  /** Streaming per-window TOP-K via flatMapGroupsWithState — rank
    * functions are unsupported on streaming DataFrames, so the
    * finalize-then-rank step is a custom stateful operator: events
    * group by their hourly window start (µs arithmetic — the key IS
    * the window), state accumulates per-user counts for that window,
    * and when the EventTimeTimeout fires at window end (i.e. the
    * watermark finalized the window: no admissible event can still
    * arrive for it) the top `k` users by (count desc, user_id) are
    * emitted with ranks and the state EVICTED in the same breath.
    *
    * State per open window is one (user → count) map, bounded by the
    * watermark to ≤ (window + lateness) of open windows at a time;
    * within a window it is O(distinct users). A deployment with
    * unbounded per-window key cardinality would swap the exact map for
    * a Misra-Gries budget (the q60 sketch) at the cost of approximate
    * tail ranks — the operator shape is unchanged. Keyed by window,
    * the state store partitions windows across executors; per-key work
    * is one hash-map fold per micro-batch.
    */
  def windowTopK(ds: Dataset[SEv], k: Int): Dataset[WindowTopUser] = {
    import ds.sparkSession.implicits._
    val hourUs = 3600L * 1000000
    ds.groupByKey(e => e.us - e.us % hourUs)
      .flatMapGroupsWithState[Map[Long, Long], WindowTopUser](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (wstart: Long, evs: Iterator[SEv],
            state: GroupState[Map[Long, Long]]) =>
          if (state.hasTimedOut) {
            // Watermark passed window end: finalized. Rank and evict.
            val counts = state.get
            state.remove()
            val ts = new java.sql.Timestamp(wstart / 1000)
            counts.toSeq.sortBy { case (u, n) => (-n, u) }.take(k)
              .zipWithIndex.iterator
              .map { case ((u, n), i) => WindowTopUser(ts, u, n, i + 1) }
          } else {
            var m = state.getOption.getOrElse(Map.empty[Long, Long])
            evs.foreach(e =>
              m = m.updated(e.user_id, m.getOrElse(e.user_id, 0L) + 1L))
            state.update(m)
            // Fire once the watermark passes window end (the same
            // strict-< clamp discipline as sessionize).
            state.setTimeoutTimestamp(
              math.max(wstart / 1000 + 3600000,
                state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Gap-detector input: user key + event time (µs) + the watermarked
    * ts column (must survive into the stateful operator's input —
    * Spark's EventTimeTimeout requirement, the SEv rule).
    */
  final case class GEv(user_id: Long, us: Long, ts: java.sql.Timestamp)

  /** A silence alert: the user went quiet — no event for more than the
    * threshold, measured against the event-time watermark.
    */
  final case class GapAlert(user_id: Long, last_us: Long, silent_ms: Long)

  /** Streaming gap/silence detector (st19) — the one GroupState-timer
    * pattern the st01–st18 surface lacked: an operator that EMITS ON
    * ABSENCE. Every other stateful op here reacts to events arriving;
    * this one's output row exists precisely because NOTHING arrived —
    * only a timer can produce it. Per user, state is the last-seen
    * event time (one long); each event re-arms an EventTimeTimeout at
    * last-seen + threshold, and if the watermark passes that point
    * with no newer event the alert fires — carrying how long the
    * source has been silent, measured against the watermark at fire
    * time — and the state EVICTS in the same breath (no key outlives
    * its alert). This is q61's gap-fill as a live operator: q61
    * densifies missing hours after the fact; st19 raises "source went
    * quiet" while the stream runs.
    *
    * Determinism: over a single-file AvailableNow run there is one
    * data micro-batch, so timers fire in the closing no-data batch
    * against the FINAL watermark (floor(max µs/1000) ms − 1 h, the
    * sessionize constant) — an alert fires iff the user's LAST event
    * predates watermark − threshold, which is exactly what the batch
    * oracle states (in a long-running deployment the same operator
    * also fires mid-stream, whenever a batch boundary lands inside a
    * gap). State per key is one long, evicted on firing — bounded by
    * ACTIVE users, not history.
    */
  def gapDetect(ds: Dataset[GEv], thresholdMs: Long): Dataset[GapAlert] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, GapAlert](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[GEv], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // The ABSENCE fired: watermark passed last-seen +
            // threshold with no event. Alert and evict.
            val lastUs = state.get
            val silent = state.getCurrentWatermarkMs() - lastUs / 1000
            state.remove()
            Iterator.single(GapAlert(user, lastUs, silent))
          } else {
            val lastUs = math.max(
              state.getOption.getOrElse(Long.MinValue),
              evs.map(_.us).max)
            state.update(lastUs)
            // Re-arm: fire once the watermark passes last-seen +
            // threshold (strict-< clamp, the sessionize discipline).
            state.setTimeoutTimestamp(
              math.max(lastUs / 1000 + thresholdMs,
                state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Run the gap detector as a REAL streaming query (2 h silence
    * threshold, 1 h watermark) and return the alerts. The oracle is
    * the batch reconstruction: users whose last event sits more than
    * the threshold before the final watermark, with the same
    * silent-duration arithmetic in ms.
    */
  def runGapDetect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = "st_gaps_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val evs = readStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("ts"))
      .as[GEv]
    withStreamShufflePartitions(spark, 8) {
      val q = gapDetect(evs, thresholdMs = 7200000L)
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainMemoryTable(spark, name, "user_id")
  }

  /** Streaming per-type percentile sketch (st17) — the mergeable GK
    * sketch (q59's `PercentileSketchAgg`) reaching the streaming
    * surface: a streaming groupBy(event_type) aggregation whose state
    * is the O(1/ε·log εn) summary itself, merged incrementally per
    * micro-batch by the state store. This is the streaming-quantile
    * deployment shape — per-key state is one bounded sketch, NOT the
    * values; a year-long stream holds the same few KB per key.
    *
    * Correctness contract: sketch VALUES are merge-order-dependent,
    * so (exactly like q59/q49) the emitted result is the GK rank
    * INVARIANT checked against the batch table — the returned value
    * for percentile p must have true rank within ε'·n of p·n. The
    * check runs at ε' = 2ε: the batch/partition merge tree is
    * exercised at ε by q59, but the streaming path merges state ⊕
    * batch as a sequential CHAIN across micro-batches, and GK merge
    * guarantees degrade additively in the worst case — the doubled
    * envelope states what the chain actually promises.
    */
  def runPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val pcts = Seq(0.5, 0.95)
    val eps = 0.01
    val sketch = udaf(
      new graft.functions.PercentileSketchAgg(pcts, eps),
      org.apache.spark.sql.Encoders.scalaDouble)
    val name = "st_pctl_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamShufflePartitions(spark, 8) {
      val q = readStream(spark, dir)
        .select(col("event_type"), col("value"))
        // NULL event_type would key a sketch row the rank-check join
        // drops while the oracle's DISTINCT emits it — filter both
        // sides explicitly (st18/q60's convention).
        .filter(col("event_type").isNotNull)
        .groupBy("event_type")
        .agg(sketch(col("value")).as("qs"))
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Complete())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val sk = drainMemoryTable(spark, name)
      .select(col("event_type"), posexplode(col("qs")).as(Seq("i", "value")))
      .select(col("event_type"),
        element_at(lit(pcts.toArray), col("i") + 1).as("pct"),
        col("value"))
    // Rank-check the sketch values with ONE pass over the batch
    // column (q59's shape): the tiny sketch output broadcasts against
    // the values and is conditional-counted per (type, percentile).
    val ev = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type").isNotNull)
      .select(col("event_type"), col("value").as("x"))
    val epsCheck = 2 * eps
    ev.join(broadcast(sk), "event_type")
      .groupBy("event_type", "pct", "value")
      .agg(
        count(lit(1)).as("n"),
        count(when(col("x") < col("value"), 1)).as("rank_lo"),
        count(when(col("x") <= col("value"), 1)).as("rank_hi"))
      .select(col("event_type"), col("pct"),
        (col("rank_lo") < ceil((col("pct") + epsCheck) * col("n")) &&
          col("rank_hi") >= floor((col("pct") - epsCheck) * col("n")))
          .as("rank_ok"))
      .orderBy("event_type", "pct")
  }

  /** Per-type exact running moments (st20's emission). */
  final case class TypeMoments(
      event_type: String, n: Long, mean: Double, variance: Double)

  /** The st20 stateful operator itself (factored so the spec drives
    * THIS code across MemoryStream micro-batches, not a copy — the
    * runningCounts/gapDetect convention): state per key is the three
    * exact integers (n, Σ¢, Σ¢²); each micro-batch folds its cents in
    * (half-away rounding, matching DuckDB ROUND on negatives too —
    * current values are nonnegative 2-decimal, where all roundings
    * agree) and emits the latest exact moments.
    */
  def moments(ds: Dataset[(String, Double)]): Dataset[TypeMoments] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long), TypeMoments](
        GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[(String, Double)],
            state: GroupState[(Long, Long, Long)]) =>
          var (n, s1, s2) = state.getOption.getOrElse((0L, 0L, 0L))
          it.foreach { case (_, v) =>
            val c =
              if (v >= 0) math.round(v * 100) else -math.round(-v * 100)
            n += 1; s1 += c; s2 += c * c
          }
          state.update((n, s1, s2))
          val num = (BigInt(n) * BigInt(s2) - BigInt(s1) * BigInt(s1))
            .toDouble
          val den = (BigInt(n) * BigInt(n) * 10000).toDouble
          TypeMoments(k, n, s1.toDouble / (100.0 * n), num / den)
      }
  }

  /** Streaming exact moments (st20) — q33's exact-power-sum variance
    * AS streaming state, completing the moments/sketch-as-state triad
    * (st17 GK quantiles, st18 MG heavy hitters): per event_type the
    * state is three integers (n, Σ¢, Σ¢²) over the 2-decimal value
    * column in cents — EXACT and order-independent, so unlike a
    * floating Welford fold the emitted mean/variance are
    * deterministic regardless of batch boundaries or merge order, and
    * the oracle can state them as values, not envelopes. Derivations
    * follow the D rules: each output divides two exactly-computed
    * numbers once (the integer numerators are computed arbitrary-
    * precision on both sides, then cast to double). State is O(1) per
    * key forever; at corpus scales where Σ¢² could exceed a long the
    * state swaps to BigInt with the same semantics.
    */
  def runMoments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = "st_moments_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val evs = readStream(spark, dir)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"), col("value"))
      .as[(String, Double)]
    withStreamShufflePartitions(spark, 8) {
      val q = moments(evs)
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Update())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // Update mode emits one state row per (key, micro-batch); n is
    // monotone, so the final moments are the max-n row per key (the
    // runRunningCounts drain convention).
    val out = spark.table(name)
    spark.catalog.dropTempView(name)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("n").desc)
    out.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n"), col("mean"), col("variance"))
      .orderBy("event_type")
  }

  /** st21's emission: the materialized latest row per key. */
  final case class CdcRow(
      user_id: Long, last_us: Long, last_event_id: Long, deleted: Int,
      value: Double)

  /** The st21 stateful operator itself (factored for the same
    * drive-the-production-code reason as [[moments]]): input rows are
    * (event_id, user_id, us, event_type, value); state per key is ONE
    * (us, event_id, type, value) — the latest by (us, event_id) —
    * and each micro-batch emits the latest-so-far row with its
    * tombstone flag.
    */
  def cdcUpsert(ds: Dataset[(Long, Long, Long, String, Double)])
      : Dataset[CdcRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._2)
      .mapGroupsWithState[(Long, Long, String, Double), CdcRow](
        GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, Long, Long, String, Double)],
            state: GroupState[(Long, Long, String, Double)]) =>
          var cur = state.getOption.getOrElse(
            (Long.MinValue, Long.MinValue, "", 0.0))
          it.foreach { case (eid, _, us, etype, v) =>
            if (us > cur._1 || (us == cur._1 && eid > cur._2))
              cur = (us, eid, etype, v)
          }
          state.update(cur)
          CdcRow(user, cur._1, cur._2,
            if (cur._3 == "error") 1 else 0, cur._4)
      }
  }

  /** Streaming CDC materialization (st21) — LATEST-record-wins upsert
    * compaction, the change-data-capture pattern st06's dedup is the
    * mirror of (st06 keeps the FIRST occurrence and drops the rest;
    * CDC keeps the LAST state and forgets history): the event stream
    * is read as an upsert/delete feed keyed by user ('error' events
    * delete the key, everything else upserts its value), state per
    * key is ONE row — the latest (us, event_id) — and the drained
    * result is the materialized table a downstream consumer would
    * read instead of replaying the log. Update mode emits the
    * latest-so-far each micro-batch; the final row per key is the
    * max-(us, event_id) emission (monotone, the runRunningCounts
    * drain). Deletes must TOMBSTONE (deleted=1), not just drop out of
    * the output: a key whose last event is a delete still has stale
    * earlier emissions in the update log, and only the tombstone
    * outranks them. State is O(keys), not O(events) — the log
    * compaction guarantee.
    */
  def runCdcUpsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name = "st_cdc_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val evs = readStream(spark, dir)
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
    withStreamShufflePartitions(spark, 8) {
      val q = cdcUpsert(evs)
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Update())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val out = spark.table(name)
    spark.catalog.dropTempView(name)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("last_us").desc, col("last_event_id").desc)
    out.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1 && col("deleted") === 0)
      .select(col("user_id"), col("last_us"), col("value"))
      .orderBy("user_id")
  }

  // ------------------------------------------------------------------
  // st28: streaming CDC → partitioned parquet lake MERGE.
  // ------------------------------------------------------------------

  /** The lake's row layout (st28): compacted CDC state partitioned by
    * key bucket, tombstones INCLUDED — replay idempotency requires
    * the lake itself to remember deletions, or a re-delivered earlier
    * batch would resurrect a deleted key.
    */
  private val lakeSchema =
    "user_id BIGINT, last_us BIGINT, last_event_id BIGINT, " +
      "deleted INT, value DOUBLE, bucket INT"

  /** One micro-batch's partition-level MERGE into the lake (st28) —
    * factored so the idempotency/restart spec can drive it directly.
    * The copy-on-write pattern at partition granularity (what a
    * table-format lake does under MERGE): (1) compact the batch to
    * its latest row per key; (2) find the key-bucket partitions the
    * batch touches (≤ 8 bucket ids — a bounded collect); (3) read the
    * CURRENT rows of exactly those partitions (partition pruning —
    * untouched buckets are directories never opened); (4) outrank
    * existing vs batch by (us, event_id) — latest wins, re-delivery
    * of an already-applied batch is a no-op by construction; (5)
    * rewrite ONLY the touched partitions (dynamic partition
    * overwrite). At 100 TB the per-batch cost is proportional to the
    * touched partitions, never the lake. The localCheckpoint is the
    * read-then-overwrite barrier a log-based table format gets from
    * its transaction log; partition-scoped CoW needs it explicitly.
    */
  def mergeBatchIntoLake(batch: DataFrame, root: String): Unit = {
    val spark = batch.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("last_us").desc, col("last_event_id").desc)
    val compacted = batch
      .select(col("user_id"), col("us").as("last_us"),
        col("event_id").as("last_event_id"),
        (col("event_type") === "error").cast("int").as("deleted"),
        col("value"),
        (col("user_id") % 8).cast("int").as("bucket"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val buckets = compacted.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    if (buckets.isEmpty) return
    val lakeDir = new java.io.File(root)
    val existing =
      if (lakeDir.exists())
        spark.read.option("basePath", root).schema(lakeSchema)
          .parquet(root)
          .filter(col("bucket").isin(buckets: _*))
      else compacted.limit(0)
    val merged = existing.unionByName(compacted)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint()
    merged.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .mode("overwrite")
      .parquet(root)
    graft.ops.Similarity.freeCheckpoint(merged)
  }

  /** Streaming CDC → partitioned lake MERGE (st28) — the lakehouse
    * staple st21 + st08 + p06 each walk one step of, composed: the
    * upsert/delete feed lands in a key-bucket-partitioned parquet
    * LAKE via per-batch idempotent MERGE (state lives in STORAGE, not
    * the state store — the complement of st21's in-memory
    * compaction), and the result is read back FROM THE LAKE FILES
    * (p06's rule: every emitted number is what a consumer will
    * actually read). The oracle is st21's batch compaction statement
    * plus the bucket column — the lake must converge to exactly the
    * compacted table, proven through the storage boundary. Restart
    * equality and replay idempotency are pinned by the spec
    * (re-applying a batch, or re-running the whole stream over a
    * fresh checkpoint, leaves the lake bit-identical).
    */
  def runCdcLakeMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.ops.SourceSinks.tmp("graft_st28")
    val root = new java.io.File(base, "lake").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    withStreamShufflePartitions(spark, 8) {
      val q = readStream(spark, dir)
        .filter(col("event_type").isNotNull && col("value").isNotNull)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("event_type"),
          col("value"))
        .writeStream
        .foreachBatch {
          (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
            mergeBatchIntoLake(batch.toDF(), root)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    new java.io.File(root).mkdirs() // empty stream: read an empty lake
    spark.read.option("basePath", root).schema(lakeSchema).parquet(root)
      .filter(col("deleted") === 0)
      .select(col("user_id"), col("bucket"), col("last_us"), col("value"))
      .orderBy("user_id")
  }

  // ------------------------------------------------------------------
  // st32: streaming CDC append lake + every-N-commits auto-OPTIMIZE.
  // ------------------------------------------------------------------

  /** Data-file schema of the st32 append lake. `bucket` is DERIVED
    * (user_id % 8) and encoded only in the directory layout, never in
    * the file bytes — so one explicit path list can mix append-era
    * and compaction-era files whose directory depths differ, and a
    * reader recomputes the bucket from the key.
    */
  private[graft] val autoLakeSchema =
    "user_id BIGINT, last_us BIGINT, last_event_id BIGINT, " +
      "deleted INT, value DOUBLE"

  /** Versioned-manifest CDC append lake with q79's bin-pack OPTIMIZE
    * running from INSIDE the sink (st32) — the lakehouse-maintenance
    * staple q79 left batch-invoked: st28-shaped per-batch appends
    * accumulate one small file per touched bucket per commit, and
    * without in-stream compaction the file count grows with stream
    * LIFETIME, unbounded. Here every `every`-th append commit
    * triggers the maintenance step q79 proves: per-file row stats
    * (manifest-metadata scale — one bounded aggregate over the
    * candidate files, standing in for the footer counts a table
    * format keeps), cumulative-offset binning with a global
    * target = rows DIV `fanout`, and ONE distributed rewrite job
    * keyed (bucket, bin) — TOUCHED buckets only, so the per-commit
    * maintenance cost tracks the write rate, never the lake size.
    *
    * Commits are MANIFEST SWAPS: every append/compaction writes the
    * new immutable file list as `manifest/v%05d.txt` after its data
    * files land; a reader resolves the list it was handed, so the
    * pre-compaction snapshot stays byte-identical (q76's time-travel
    * invariant — compaction ADDS files and publishes a list that no
    * longer references the packed inputs; q75's vacuum reclaims them
    * later). The rewrite is LOSSLESS row-for-row (physical bin-pack,
    * no semantic merge): latest-per-key resolution happens at read,
    * identically before and after, which is what makes mid-stream
    * compaction safe under replay — a re-delivered append only adds
    * rows that lose the (last_us, last_event_id) outranking.
    *
    * Reference hook: the batched-writer flush discipline of
    * `/root/reference/src/main.rs:398-434` — amortize many small
    * emissions into bounded-size physical units without changing
    * the logical content.
    */
  final class AutoCompactLake(spark: SparkSession, root: String,
      every: Int = 2, fanout: Int = 4,
      retainVersions: Option[Int] = None) {
    private val dataDir = new java.io.File(root, "data")
    private val manifestDir = new java.io.File(root, "manifest")
    dataDir.mkdirs(); manifestDir.mkdirs()
    // (bucket, path) rows of the CURRENT manifest.
    private var files = Vector.empty[(Int, String)]
    private var version = 0
    private var seq = 0
    private var appendsSinceCompact = 0
    private var touched = Set.empty[Int]
    /** Spec meter: completed compaction commits. */
    private[graft] var compactions = 0
    /** Spec meter: data files physically reclaimed by retention. */
    private[graft] var filesVacuumed = 0

    def currentVersion: Int = version
    def currentFiles: Seq[(Int, String)] = files

    private def writeManifest(): Unit = {
      version += 1
      val f = new java.io.File(manifestDir, f"v$version%05d.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try files.foreach { case (b, p) => w.println(s"$b\t$p") }
      finally w.close()
    }

    /** Read a committed manifest version back from disk — the list a
      * pinned reader holds across later commits.
      */
    def manifestFiles(v: Int): Seq[(Int, String)] = {
      val src = scala.io.Source.fromFile(
        new java.io.File(manifestDir, f"v$v%05d.txt"), "UTF-8")
      try src.getLines().map { line =>
        val Array(b, p) = line.split("\t", 2)
        (b.toInt, p)
      }.toVector
      finally src.close()
    }

    /** Raw rows of a manifest version (no resolution) — the physical
      * read-back the lossless-rewrite spec compares.
      */
    def readVersion(v: Int): DataFrame = readPaths(
      manifestFiles(v).map(_._2))

    private def readPaths(paths: Seq[String]): DataFrame =
      if (paths.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(autoLakeSchema))
      else spark.read.schema(autoLakeSchema).parquet(paths: _*)

    /** Latest-per-key resolution over the CURRENT manifest, tombstones
      * dropped — what a consumer reads. Identical before/after any
      * compaction because the rewrite is row-preserving.
      */
    def resolvedCurrent(): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("last_us").desc, col("last_event_id").desc)
      readPaths(files.map(_._2))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("deleted") === 0)
        .select(col("user_id"),
          (col("user_id") % 8).cast("int").as("bucket"),
          col("last_us"), col("value"))
    }

    private def listParquet(dir: java.io.File): Seq[(Int, String)] = {
      // -? : Spark % is sign-of-dividend (as is the oracle's), so a
      // negative user_id legitimately writes a bucket=-N directory.
      val Bucket = ".*bucket=(-?\\d+).*".r
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
      walk(dir).map { f =>
        val Bucket(b) = f.getAbsolutePath
        (b.toInt, f.getAbsolutePath)
      }.sortBy(_._2)
    }

    /** One CDC micro-batch: compact to latest-per-key, append ONE
      * file per touched bucket under a fresh commit directory, swap
      * the manifest, then OPTIMIZE if the commit cadence says so.
      */
    def append(batch: DataFrame): Unit = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("last_us").desc, col("last_event_id").desc)
      val delta = batch
        .select(col("user_id"), col("us").as("last_us"),
          col("event_id").as("last_event_id"),
          (col("event_type") === "error").cast("int").as("deleted"),
          col("value"),
          (col("user_id") % 8).cast("int").as("bucket"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      seq += 1
      val commit = new java.io.File(dataDir, f"b$seq%05d")
      // repartition BY bucket → every bucket's rows land in one task
      // → exactly one file per touched bucket per commit.
      delta.repartition(col("bucket"))
        .write.partitionBy("bucket").mode("overwrite")
        .parquet(commit.getAbsolutePath)
      val newFiles = listParquet(commit)
      if (newFiles.isEmpty) return // empty batch: no commit
      files ++= newFiles
      writeManifest()
      touched ++= newFiles.map(_._1)
      appendsSinceCompact += 1
      if (appendsSinceCompact >= every) compact()
    }

    /** q79's OPTIMIZE as in-stream maintenance: bin-pack the touched
      * buckets' current files into ≈`fanout` target-size files and
      * swap the manifest. Untouched buckets' files pass through the
      * new manifest UNREAD — the 100 TB property.
      */
    private def compact(): Unit = {
      val cand = files.filter { case (b, _) => touched(b) }
      val keep = files.filterNot { case (b, _) => touched(b) }
      // Planning stats in input_file_name space (one bounded agg —
      // ≤ |candidate files| rows; a table format reads these counts
      // straight from its manifest instead).
      val stats = readPaths(cand.map(_._2))
        .select(input_file_name().as("f"),
          (col("user_id") % 8).cast("int").as("bucket"))
        .groupBy("f", "bucket").agg(count(lit(1)).as("rows"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      val target = math.max(1L, stats.map(_._3).sum / fanout)
      // Cumulative-offset binning per bucket, files in path order
      // (commit dirs are zero-padded, so append order is preserved;
      // ordering only shapes the packing, never the content).
      val plan = stats.groupBy(_._2).toSeq.flatMap { case (_, fs) =>
        var cum = 0L
        fs.sortBy(_._1).map { case (f, b, n) =>
          val bin = (cum / target).toInt
          cum += n
          (f, b, bin)
        }
      }
      import spark.implicits._
      val planDf = plan.toDF("f", "bucket", "bin")
      val cdir = new java.io.File(dataDir, f"c${version + 1}%05d")
      // ONE distributed rewrite keyed (bucket, bin) — one file out
      // per bin, rows byte-identical to the inputs.
      readPaths(cand.map(_._2))
        .withColumn("f", input_file_name())
        .join(broadcast(planDf), "f")
        .select(col("user_id"), col("last_us"), col("last_event_id"),
          col("deleted"), col("value"), col("bucket"), col("bin"))
        .repartition(col("bucket"), col("bin"))
        .write.partitionBy("bucket", "bin").mode("overwrite")
        .parquet(cdir.getAbsolutePath)
      files = keep ++ listParquet(cdir)
      writeManifest()
      compactions += 1
      appendsSinceCompact = 0
      touched = Set.empty
      retainVersions.foreach(vacuum)
    }

    /** Retention vacuum (st33) — q75's reclaim run from INSIDE the
      * stream, after each OPTIMIZE: every data file referenced only
      * by manifests OUTSIDE the newest `keepVersions` is physically
      * deleted, and the expired manifests go with it. Snapshots older
      * than the retention window thereby EXPIRE (that is the
      * contract — time travel is bounded by retention, exactly as in
      * a production table format); the retained window and the
      * current state are untouched, because a file referenced by ANY
      * retained manifest is kept.
      *
      * Altitude (the r17 verdict fix): reclamation is a MANIFEST
      * DIFF — orphans = (∪ expired manifests' file lists) − (∪
      * retained manifests' file lists) — never a walk of the data
      * store. Every committed data file appears in the manifest
      * written by its own commit, so the diff is exhaustive for
      * committed files; and because each expired manifest is deleted
      * once processed, a manifest is diffed AT MOST ONCE over the
      * lake's lifetime — per-vacuum driver cost is bounded by the
      * commits since the last vacuum (retention-window-scale), never
      * by lake size or stream lifetime. Files a crashed writer left
      * behind without a manifest swap are the one class the diff
      * cannot see; [[sweepOrphans]] is the explicit rare deep walk
      * for those.
      */
    def vacuum(keepVersions: Int): Int = {
      val keepFrom = math.max(1, version - keepVersions + 1)
      // Existence-filter the retained range too (r18 ADVICE): a later
      // vacuum with a LARGER keepVersions than an earlier call reaches
      // back into manifests that earlier call already expired — those
      // are gone from disk (and their data files with them), so they
      // contribute nothing to the live set rather than throwing.
      val live = (keepFrom to version)
        .filter(v => new java.io.File(manifestDir, f"v$v%05d.txt")
          .exists())
        .flatMap(v => manifestFiles(v).map(_._2)).toSet
      val expired = (1 until keepFrom)
        .map(v => (v, new java.io.File(manifestDir, f"v$v%05d.txt")))
        .filter(_._2.exists())
      val orphans = expired
        .flatMap { case (v, _) => manifestFiles(v).map(_._2) }
        .distinct.filterNot(live)
      orphans.foreach(p => new java.io.File(p).delete())
      expired.foreach(_._2.delete()) // snapshot expiry includes metadata
      filesVacuumed += orphans.size
      orphans.size
    }

    /** Crash-orphan sweep — the explicit DEEP walk [[vacuum]] no
      * longer does on the hot path: data files that belong to NO
      * manifest on disk (a writer died between landing its files and
      * swapping the manifest) are unreachable by any reader and by
      * the manifest diff, so an operator runs this rarely —
      * store-scale cost, off the write path by design.
      */
    def sweepOrphans(): Int = {
      val referenced = (1 to version)
        .filter(v => new java.io.File(manifestDir, f"v$v%05d.txt")
          .exists())
        .flatMap(v => manifestFiles(v).map(_._2)).toSet
      val orphans = listParquet(dataDir)
        .map(_._2).filterNot(referenced)
      orphans.foreach(p => new java.io.File(p).delete())
      orphans.size
    }
  }

  /** Streaming CDC → append lake with auto-compaction (st32) — see
    * [[AutoCompactLake]]. To make the cadence REAL (a single-file
    * AvailableNow source is one micro-batch), the events feed is
    * first split into 6 time-slice files (q79's integer slicing) and
    * streamed with maxFilesPerTrigger=1 → 6 append commits → 3
    * in-stream compactions. The result is the final manifest's
    * resolved state — st21/st28's compacted-table statement through
    * BOTH the storage boundary and the mid-stream rewrites, so the
    * oracle (st28's, verbatim) hash-matches iff every compaction was
    * lossless.
    */
  def runCdcLakeAutoCompact(spark: SparkSession, dir: String): DataFrame =
    runAutoCompactStream(spark, dir, "graft_st32", None)

  /** Streaming CDC lake with auto-compaction AND retention (st33) —
    * the full in-stream maintenance loop: append → every-2nd-commit
    * OPTIMIZE → vacuum of every data file outside the newest-3
    * manifests. Snapshots older than the retention window expire
    * (q75's reclaim, now on the stream's own cadence — the bounded
    * time travel a production table format actually offers); the
    * oracle is st28's compacted-table statement UNCHANGED, so the
    * hash match proves retention never reclaims a live or retained
    * file.
    */
  def runCdcLakeRetention(spark: SparkSession, dir: String): DataFrame =
    runAutoCompactStream(spark, dir, "graft_st33", Some(3))

  private def runAutoCompactStream(spark: SparkSession, dir: String,
      tag: String, retain: Option[Int]): DataFrame = {
    val base = graft.ops.SourceSinks.tmp(tag)
    val input = new java.io.File(base, "input").getAbsolutePath
    val root = new java.io.File(base, "lake").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    val ev = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
    val b = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"),
      count(lit(1)).as("n")).collect()(0) // 1-row bounded fetch
    val lake = new AutoCompactLake(spark, root, every = 2, fanout = 4,
      retainVersions = retain)
    if (b.getLong(2) > 0) {
      val slices = 6
      // NULL-exhaustive slicing (the q86 rule, r17 ADVICE): a null-ts
      // event has us NULL, so the raw slice expression is NULL and
      // the row would match NO slice filter — silently dropped while
      // the shared st28 oracle (no ts filter) still emits it. Null-us
      // rows route to slice 0 instead: they flow through the lake and
      // rank LAST under the (last_us DESC, last_event_id DESC)
      // resolution in BOTH engines (Spark desc and DuckDB's default
      // are both NULLS LAST). An all-dateless feed (mn NULL) is the
      // degenerate one-slice case.
      val sliceExpr =
        if (b.isNullAt(0)) lit(0)
        else {
          val (mn, mx) = (b.getLong(0), b.getLong(1))
          coalesce(expr(
            s"CAST(((us - ${mn}L) * $slices) DIV ${mx - mn + 1}L AS INT)"),
            lit(0))
        }
      writeSlices(ev.select(col("event_id"), col("user_id"), col("us"),
        col("event_type"), col("value"), sliceExpr.as("slice")),
        slices, input)
      withStreamShufflePartitions(spark, 8) {
        val q = spark.readStream
          .schema("event_id BIGINT, user_id BIGINT, us BIGINT, " +
            "event_type STRING, value DOUBLE")
          .option("recursiveFileLookup", "true")
          .option("pathGlobFilter", "*.parquet")
          .option("maxFilesPerTrigger", "1")
          .parquet(input)
          .writeStream
          .foreachBatch {
            (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
              lake.append(batch.toDF())
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    }
    lake.resolvedCurrent().orderBy("user_id")
  }

  // ------------------------------------------------------------------
  // st34: streaming graph maintenance — WCC labels refreshed in-stream.
  // ------------------------------------------------------------------

  /** Streaming WCC label maintenance (st34) — q88's seeded converge
    * composed into the st32 in-stream maintenance pattern: trade-pair
    * deltas arrive as micro-batches, the pair set and the component
    * LABEL STORE both live in the lake (parquet, read back before
    * every use — the q86/q88 storage boundary), and every `every`-th
    * commit a refresh re-converges the labels SEEDED from the stored
    * vector: existing nodes start at their stored component label,
    * new nodes at their own id. The refresh relaxes to an OBSERVED
    * fixpoint ([[graft.ops.Graph.relaxToFixpoint]] — a streaming
    * maintainer cannot know each delta's change diameter up front,
    * so it probes per round and throws at the cap rather than
    * publishing a non-fixpoint), which, by q88's seeding-soundness
    * argument (labels only decrease; every stored label is a node id
    * inside the same full component whose minimum labels itself),
    * equals the from-scratch fixpoint — so the batch q80 statement
    * is an EXACT oracle for the stream's final label store.
    *
    * Scale shape: per-refresh cost is (change-diameter + 1) rounds of
    * one |E| join + a node-sized MIN each — the rounds track the
    * DELTA's diameter, not the graph's, because the flood only has
    * to cross newly merged boundaries; the label store read/write is
    * node-sized; commits between refreshes cost one bounded append.
    * At 100 TB the pair lake would be st32's bucketed manifest table;
    * the refresh cadence amortizes the label rebuild over `every`
    * commits exactly as st32 amortizes its OPTIMIZE.
    */
  final class WccLabelLake(spark: SparkSession, root: String,
      every: Int = 2, maxRounds: Int = 50) {
    private val pairsDir = new java.io.File(root, "pairs")
    private val labelsDir = new java.io.File(root, "labels")
    pairsDir.mkdirs()
    private var pendingSinceRefresh = 0
    /** Spec meter: completed label refreshes. */
    private[graft] var refreshes = 0

    private def readPairs(): DataFrame =
      spark.read.schema("sk BIGINT, ck BIGINT")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(pairsDir.getAbsolutePath)

    private def readLabels(): DataFrame =
      if (!labelsDir.exists())
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType.fromDDL("node BIGINT, label BIGINT"))
      else spark.read.schema("node BIGINT, label BIGINT")
        .parquet(labelsDir.getAbsolutePath)

    /** One micro-batch of (sk, ck) pair deltas: append to the pair
      * lake under a commit directory KEYED BY THE STREAM'S batchId
      * (the st28/SigStoreLake rule, r18 ADVICE fix) — a
      * failure-retried micro-batch REWRITES its own commit in place
      * instead of appending duplicate pairs, and replay cannot
      * double-count the refresh cadence (the replay's commit dir
      * already exists, so `pendingSinceRefresh` stays put). Refresh
      * on cadence.
      */
    def append(batch: DataFrame, batchId: Long): Unit = {
      val delta = batch.select(col("sk"), col("ck"))
      if (delta.isEmpty) return
      val commit = new java.io.File(pairsDir, f"b$batchId%05d")
      val replay = commit.exists()
      delta.write.mode("overwrite").parquet(commit.getAbsolutePath)
      if (!replay) pendingSinceRefresh += 1
      if (pendingSinceRefresh >= every) refresh()
    }

    /** Seeded converge over the full accumulated pair set, label
      * store overwritten in place (the converged frame is
      * checkpointed before the write, so overwriting the storage it
      * was seeded from is safe).
      */
    def refresh(): Unit = {
      val cps = scala.collection.mutable.ArrayBuffer[DataFrame]()
      def cp(df: DataFrame): DataFrame = {
        val c = df.localCheckpoint(); cps += c; c
      }
      try {
        // dst-keyed materialization (Graph.cpKeyed): every relax
        // round's min aggregate inside relaxToFixpoint reuses this
        // one exchange. cpKeyed checkpoints itself — register only.
        // Size hint: lake parquet bytes × 8 (decode + both-direction
        // doubling) — a driver-side listing, no job.
        val edges = graft.ops.Graph.cpKeyed(
          graft.ops.Graph.withSelfLoops(
            graft.ops.Graph.bipartiteEdges(readPairs())), "dst",
          8L * dirParquetBytes(pairsDir))
        cps += edges
        val nodes = edges.select(col("src").as("node")).distinct()
        // The label store is node-sized — broadcast it under the
        // guard; the row bound derives from the store's parquet
        // bytes (2-LONG rows never compress below ~4 B/row, so
        // bytes/4 over-estimates rows — conservative).
        val seeded = nodes
          .join(graft.ops.Graph.bcastIf(
            readLabels().withColumnRenamed("node", "bn")
              .withColumnRenamed("label", "bl"),
            dirParquetBytes(labelsDir) / 4),
            col("node") === col("bn"), "left")
          .select(col("node"),
            coalesce(col("bl"), col("node")).as("label"))
        val converged = graft.ops.Graph.relaxToFixpoint(
          edges, seeded, maxRounds, cp)
        converged.write.mode("overwrite")
          .parquet(labelsDir.getAbsolutePath)
        refreshes += 1
        pendingSinceRefresh = 0
      } finally cps.foreach(graft.ops.Similarity.freeCheckpoint)
    }

    /** Refresh only if commits landed since the last one — the
      * stream-end flush.
      */
    def refreshIfPending(): Unit =
      if (pendingSinceRefresh > 0) refresh()

    /** The q80-shaped (c_size → n_components) histogram of the label
      * STORE — read back from disk, so the emitted numbers are what a
      * downstream consumer of the lake actually sees.
      */
    def labelsHistogram(): DataFrame =
      readLabels().groupBy("label").agg(count(lit(1)).as("c_size"))
        .groupBy("c_size").agg(count(lit(1)).as("n_components"))
        .orderBy("c_size")
  }

  /** Streaming WCC maintenance end-to-end (st34): the same-nation
    * dated trade pairs (q88's pair set) split into 6 first-trade-day
    * slices (null-day pairs route to slice 0 — the st32 rule) and
    * streamed one file per trigger → 6 append commits → 3 in-stream
    * seeded refreshes. The result is the final label store's
    * component histogram; the oracle is q80's batch statement
    * UNCHANGED, so the hash match proves the in-stream incremental
    * maintenance converged to exactly the batch answer through every
    * storage boundary.
    */
  def runStreamWccMaintenance(spark: SparkSession,
      dir: String): DataFrame = {
    val base = graft.ops.SourceSinks.tmp("graft_st34")
    val input = new java.io.File(base, "input").getAbsolutePath
    val root = new java.io.File(base, "lake").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    val dated = graft.ops.Graph.datedTradePairsCached(spark, dir)
      .join(broadcast(graft.Tables.load(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey").as("sn"))),
        col("sk") === col("s_suppkey"))
      .join(graft.Tables.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").as("cn")),
        col("ck") === col("c_custkey"))
      .filter(col("sn") === col("cn"))
      .select(col("sk"), col("ck"), col("d0"))
    val b = dated.agg(min("d0").as("mn"), max("d0").as("mx"),
      count(lit(1)).as("n")).collect()(0) // 1-row bounded fetch
    val lake = new WccLabelLake(spark, root, every = 2)
    if (b.getLong(2) > 0) {
      val slices = 6
      val sliceExpr =
        if (b.isNullAt(0)) lit(0)
        else {
          val (mn, mx) = (b.getLong(0), b.getLong(1))
          coalesce(expr(
            s"CAST(((d0 - ${mn}L) * $slices) DIV ${mx - mn + 1}L AS INT)"),
            lit(0))
        }
      writeSlices(dated.select(col("sk"), col("ck"),
        sliceExpr.as("slice")), slices, input)
      withStreamShufflePartitions(spark, 8) {
        val q = spark.readStream
          .schema("sk BIGINT, ck BIGINT")
          .option("recursiveFileLookup", "true")
          .option("pathGlobFilter", "*.parquet")
          .option("maxFilesPerTrigger", "1")
          .parquet(input)
          .writeStream
          .foreachBatch {
            (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
              lake.append(batch.toDF(), bid)
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      lake.refreshIfPending() // commits after the last cadence point
    }
    lake.labelsHistogram()
  }

  // ------------------------------------------------------------------
  // st36: streaming rank maintenance — PageRank refreshed in-stream.
  // ------------------------------------------------------------------

  /** Streaming PageRank maintenance (st36) — q89's seeded rank
    * refresh composed into st34's in-stream maintenance pattern: the
    * last incremental artifact that still lived batch-only. Trade-pair
    * deltas arrive as micro-batches; the pair set and the rank VECTOR
    * both live in the lake (parquet, read back before every use — the
    * q86/q88 storage boundary); every `every`-th commit a refresh
    * re-converges the ranks: the FIRST refresh is the cold backfill
    * (`baseIters` uniform-start rounds — no store exists yet), every
    * later refresh runs only `deltaIters` rounds SEEDED from the
    * stored vector rescaled by the exact integer node-count ratio
    * nPrev/n (q89's split — nodes only accumulate, so nPrev ≤ n and
    * every term stays under the 10¹² mass bound), with the teleport
    * re-based to the era's node count. Seeding near the previous
    * equilibrium means the 0.85 contraction only has to close the
    * DELTA's perturbation — the steady-state daily cost is
    * `deltaIters` rounds plus one rank-store read, never the cold
    * `baseIters` recompute (ScaleSmoke `incpr` meters exactly this
    * for q89; the spec's stream≡batch compare pins the cadence).
    *
    * Replay/restart: pair commits are KEYED BY batchId and rewritten
    * in place (the st28/SigStoreLake rule) — a failure-retried batch
    * cannot append duplicate pairs (which would corrupt outdeg) or
    * double-count the cadence. Unlike WCC (start-independent
    * fixpoint), the rank vector is cadence-dependent, so the oracle
    * restates the whole streamed recurrence era by era
    * ([[graft.ops.Graph.sqlStreamIncrementalPageRank]]) — which is
    * also why the CADENCE must be deterministic: empty micro-batches
    * still advance it (an empty commit is written), and the slice
    * feed's discovery order is mtime-pinned ([[pinSliceOrder]]).
    *
    * Scale shape: per-refresh cost is `deltaIters` rounds of one |E|
    * join + a node-sized LONG sum (q77's per-round shape); the rank
    * store read/write is node-sized; commits between refreshes cost
    * one bounded append. At 100 TB the pair lake would be st32's
    * bucketed manifest table and the refresh cadence amortizes the
    * rank rebuild over `every` commits exactly as st32 amortizes its
    * OPTIMIZE.
    */
  final class RankLake(spark: SparkSession, root: String,
      every: Int = 2, baseIters: Int = 10, deltaIters: Int = 4) {
    private val pairsDir = new java.io.File(root, "pairs")
    private val ranksDir = new java.io.File(root, "ranks")
    pairsDir.mkdirs()
    private var pendingSinceRefresh = 0
    /** Spec meter: completed rank refreshes. */
    private[graft] var refreshes = 0

    private def readPairs(): DataFrame =
      spark.read.schema("sk BIGINT, ck BIGINT")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(pairsDir.getAbsolutePath)

    private def readRanks(): DataFrame =
      spark.read.schema("node BIGINT, r BIGINT")
        .parquet(ranksDir.getAbsolutePath)

    /** One micro-batch of (sk, ck) pair deltas: commit keyed by the
      * stream's batchId (replay rewrites in place), refresh on
      * cadence. An EMPTY batch still writes its (empty) commit and
      * advances the cadence — the refresh ERAS are what the unrolled
      * oracle restates, so they must depend only on the batch index,
      * never on slice occupancy.
      */
    def append(batch: DataFrame, batchId: Long): Unit = {
      val commit = new java.io.File(pairsDir, f"b$batchId%05d")
      val replay = commit.exists()
      batch.select(col("sk"), col("ck"))
        .write.mode("overwrite").parquet(commit.getAbsolutePath)
      if (!replay) pendingSinceRefresh += 1
      if (pendingSinceRefresh >= every) refresh()
    }

    /** Re-converge the rank store over the full accumulated pair set:
      * cold `baseIters` backfill when no store exists, else
      * `deltaIters` rounds seeded from the stored vector (rescaled,
      * teleport re-based). The converged frame is checkpointed before
      * the write, so overwriting the storage it was seeded from is
      * safe.
      */
    def refresh(): Unit = {
      val cps = scala.collection.mutable.ArrayBuffer[DataFrame]()
      def cp(df: DataFrame): DataFrame = {
        val c = df.localCheckpoint(); cps += c; c
      }
      try {
        val edges0 = graft.ops.Graph.bipartiteEdges(readPairs())
        val outdeg = edges0.groupBy("src")
          .agg(count(lit(1)).as("outdeg"))
        // dst-keyed materialization (Graph.cpKeyed): every rank
        // round's in-sum aggregate reuses this one exchange. cpKeyed
        // checkpoints itself — register only. Size hint: lake parquet
        // bytes × 8 (decode + both-direction doubling), no job.
        // Node-sized outdeg broadcast under the guard; the row
        // bound derives from the pair lake's bytes (2-LONG rows
        // never compress below ~4 B/row, so bytes/4 over-estimates).
        val edges = graft.ops.Graph.cpKeyed(
          edges0.join(graft.ops.Graph.bcastIf(outdeg,
            dirParquetBytes(pairsDir) / 4), "src"), "dst",
          8L * dirParquetBytes(pairsDir))
        cps += edges
        val nodes = cp(edges.select(col("src").as("node")).distinct())
        val n = nodes.count() // 1-row bounded fetch (node count)
        if (n == 0L) { pendingSinceRefresh = 0; return }
        val base = 1000000000000L / n
        val teleport = (15L * base) / 100L
        val (seed, iters) =
          if (!ranksDir.exists())
            (cp(nodes.select(col("node"), lit(base).as("r"))), baseIters)
          else {
            val stored = readRanks()
            val nPrev = stored.count() // node-sized store, bounded
            (cp(nodes
              // node-sized store — broadcast under the guard (r20)
              .join(graft.ops.Graph.bcastIf(
                stored.withColumnRenamed("node", "bn")
                  .withColumnRenamed("r", "br"), nPrev),
                col("node") === col("bn"), "left")
              .select(col("node"),
                coalesce(
                  expr(s"(br div ${n}L) * ${nPrev}L + " +
                    s"((br % ${n}L) * ${nPrev}L) div ${n}L"),
                  lit(base)).as("r"))), deltaIters)
          }
        val ranks = graft.ops.Graph.prRounds(edges, nodes, seed,
          teleport, iters, cp, n) // final round is cp'd by prRounds
        ranks.write.mode("overwrite").parquet(ranksDir.getAbsolutePath)
        refreshes += 1
        pendingSinceRefresh = 0
      } finally cps.foreach(graft.ops.Similarity.freeCheckpoint)
    }

    /** Refresh only if commits landed since the last one — the
      * stream-end flush.
      */
    def refreshIfPending(): Unit =
      if (pendingSinceRefresh > 0) refresh()

    /** Top-`k` of the rank STORE read back from disk — what a
      * downstream consumer of the lake actually sees.
      */
    def topK(k: Int): DataFrame = {
      import spark.implicits._
      if (!ranksDir.exists())
        return Seq.empty[(Int, String, Long, Long)]
          .toDF("rnk", "node_type", "node_id", "r")
      graft.ops.Graph.prTopK(readRanks(), k)
        .toDF("rnk", "node_type", "node_id", "r")
    }
  }

  /** Streaming PageRank maintenance end-to-end (st36): the dated
    * trade pairs (q89's pair set) split into `slices` first-trade-day
    * slices (null-day pairs route to slice 0 — the st32 rule),
    * discovery order mtime-PINNED (the oracle is cadence-dependent),
    * streamed one file per trigger → 6 commits → 3 in-stream rank
    * refreshes (cold backfill + 2 seeded). The result is the final
    * rank store's top-25; the oracle restates the whole streamed
    * recurrence — see [[RankLake]].
    */
  def runStreamPagerankMaintenance(spark: SparkSession,
      dir: String): DataFrame = {
    val base = graft.ops.SourceSinks.tmp("graft_st36")
    val input = new java.io.File(base, "input").getAbsolutePath
    val root = new java.io.File(base, "lake").getAbsolutePath
    val ckpt = new java.io.File(base, "ckpt").getAbsolutePath
    val dated = graft.ops.Graph.datedTradePairsCached(spark, dir)
    val b = dated.agg(min("d0").as("mn"), max("d0").as("mx"),
      count(lit(1)).as("n")).collect()(0) // 1-row bounded fetch
    val lake = new RankLake(spark, root, every = 2)
    if (b.getLong(2) > 0) {
      val slices = 6
      val sliceExpr =
        if (b.isNullAt(0)) lit(0)
        else {
          val (mn, mx) = (b.getLong(0), b.getLong(1))
          coalesce(expr(
            s"CAST(((d0 - ${mn}L) * $slices) DIV ${mx - mn + 1}L AS INT)"),
            lit(0))
        }
      // writeSlices pins the order — the oracle needs batch i ⟺ slice i.
      writeSlices(dated.select(col("sk"), col("ck"),
        sliceExpr.as("slice")), slices, input)
      withStreamShufflePartitions(spark, 8) {
        val q = spark.readStream
          .schema("sk BIGINT, ck BIGINT")
          .option("recursiveFileLookup", "true")
          .option("pathGlobFilter", "*.parquet")
          .option("maxFilesPerTrigger", "1")
          .parquet(input)
          .writeStream
          .foreachBatch {
            (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
              lake.append(batch.toDF(), bid)
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      lake.refreshIfPending() // commits after the last cadence point
    }
    lake.topK(25)
  }

  /** st23's per-user state: the first view seen so far plus ONLY the
    * clicks/purchases that could still qualify under any FUTURE first
    * view — see [[windowedFunnel]] for the pruning argument.
    */
  final case class FunnelState(
      vUs: Long, nSeen: Long, clicks: List[Long], purchases: List[Long])

  /** st23's emission: funnel stage flags recomputed from full state,
    * with the monotone per-user event counter the drain orders by and
    * the retained-buffer size (clicks + purchases held in state) the
    * ScaleSmoke `funnel` mode measures the horizon bound with.
    */
  final case class FunnelRow(
      user_id: Long, n_seen: Long, v_ok: Int, c_ok: Int, p_ok: Int,
      n_buffered: Int)

  /** The st23 stateful operator (factored to drive the production
    * code from the spec): input rows are (user_id, event_type, us);
    * per-key state is [[FunnelState]]; each micro-batch emits the
    * user's current funnel verdict.
    *
    * EXACT under out-of-order arrival with BOUNDED state — the
    * funnel's own windows are the bound. The first-view time v only
    * ever DECREASES, so a click with us > v + 48h can never qualify
    * under any future v either (the qualifying interval (v', v'+48h]
    * for v' ≤ v lies entirely at or below v + 48h) — prune it
    * forever; a click with us ≤ v, useless now, may qualify under a
    * later-arriving EARLIER view, so it must be retained. Same
    * argument bounds purchases at v + 48h + 7d (the deepest any
    * qualifying click's window can reach). State per user is thus
    * the events inside the user's own conversion horizon — O(funnel
    * window), not O(stream); ScaleSmoke's `funnel` mode measures the
    * plateau. The emitted verdict is recomputed from the retained
    * sets each batch, so the LAST emission per user (max n_seen — a
    * strictly-increasing counter) is the stream's fixpoint and
    * equals the batch q66 statement exactly.
    */
  def windowedFunnel(ds: Dataset[(Long, String, Long)])
      : Dataset[FunnelRow] = {
    import ds.sparkSession.implicits._
    val clickW = 48L * 3600L * 1000000L
    val purchW = 7L * 24L * 3600L * 1000000L
    ds.groupByKey(_._1)
      .mapGroupsWithState[FunnelState, FunnelRow](
        GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[(Long, String, Long)],
            state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(
            FunnelState(Long.MaxValue, 0L, Nil, Nil))
          var v = st.vUs
          var n = st.nSeen
          var clicks = st.clicks
          var purchases = st.purchases
          // Retention bounds under the CURRENT v (+inf before any
          // view — nothing can be pruned until the window anchors).
          def cBound: Long =
            if (v == Long.MaxValue) Long.MaxValue else v + clickW
          def pBound: Long =
            if (v == Long.MaxValue) Long.MaxValue
            else v + clickW + purchW
          it.foreach { case (_, t, us) =>
            n += 1
            t match {
              case "view" =>
                if (us < v) {
                  v = us // window anchor moved earlier: re-prune
                  clicks = clicks.filter(_ <= cBound)
                  purchases = purchases.filter(_ <= pBound)
                }
              case "click" =>
                if (us <= cBound) clicks = us :: clicks
              case "purchase" =>
                if (us <= pBound) purchases = us :: purchases
              case _ => ()
            }
          }
          state.update(FunnelState(v, n, clicks, purchases))
          val cStar =
            if (v == Long.MaxValue) None
            else clicks.filter(c => c > v && c <= v + clickW)
              .minOption
          val pStar = cStar.flatMap(c =>
            purchases.filter(p => p > c && p <= c + purchW).minOption)
          FunnelRow(user, n,
            if (v != Long.MaxValue) 1 else 0,
            if (cStar.isDefined) 1 else 0,
            if (pStar.isDefined) 1 else 0,
            clicks.length + purchases.length)
      }
  }

  /** Streaming WINDOWED FUNNEL (st23) — q66 as a live stream: per-user
    * conversion state (first view → click within 48 h → purchase
    * within 7 d of that click) maintained by [[windowedFunnel]]'s
    * mapGroupsWithState machine, exact under out-of-order arrival
    * with state bounded by the funnel's own conversion horizon. The
    * drained result is the three-stage count table — identical to the
    * batch q66 statement, which is the oracle.
    */
  def runWindowedFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val name =
      "st_funnel_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val evs = readStream(spark, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[(Long, String, Long)]
    withStreamShufflePartitions(spark, 8) {
      val q = windowedFunnel(evs)
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Update())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val out = spark.table(name)
    spark.catalog.dropTempView(name)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_seen").desc)
    val fin = out
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1)
      .localCheckpoint() // three count branches read it; don't re-drain
    fin.filter(col("v_ok") === 1).agg(count(lit(1)).as("n_users"))
      .select(lit("1_view").as("stage"), col("n_users"))
      .unionByName(fin.filter(col("c_ok") === 1)
        .agg(count(lit(1)).as("n_users"))
        .select(lit("2_click_within_48h").as("stage"), col("n_users")))
      .unionByName(fin.filter(col("p_ok") === 1)
        .agg(count(lit(1)).as("n_users"))
        .select(lit("3_purchase_within_7d").as("stage"), col("n_users")))
      .orderBy("stage")
  }

  /** Streaming Misra-Gries heavy hitters (st18) — q60's mergeable MG
    * sketch AS streaming state: a global streaming aggregation whose
    * state is ONE capacity-k counter table, merged per micro-batch by
    * the state store (MG summaries merge losslessly — Agarwal et al.
    * 2012, "Mergeability of summaries" — so the sequential state ⊕
    * batch chain keeps the exact same guarantee as q60's partition
    * tree: every item with true frequency > n/(k+1) is present,
    * estimated within [f − n/(k+1), f]). Capacity 4 over the 5-valued
    * event_type forces eviction every batch. The emitted result is
    * the invariant checked against the batch exact counts (q60's
    * integer-exact formulation), so the oracle is a literal TRUE row
    * per heavy type.
    */
  def runHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val k = 4
    val sketch = udaf(new graft.functions.HeavyHittersAgg(k),
      org.apache.spark.sql.Encoders.STRING)
    val name = "st_hh_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamShufflePartitions(spark, 8) {
      val q = readStream(spark, dir)
        .filter(col("event_type").isNotNull)
        .select(col("event_type"))
        .agg(sketch(col("event_type")).as("hh"))
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode(OutputMode.Complete())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val est = drainMemoryTable(spark, name)
      .select(explode(col("hh")).as(Seq("event_type", "est")))
    val d = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type").isNotNull).select(col("event_type"))
    val heavy = d.groupBy("event_type").agg(count(lit(1)).as("f"))
      .crossJoin(broadcast(d.agg(count(lit(1)).as("n"))))
      .filter(col("f") * (k + 1) > col("n"))
    heavy.join(broadcast(est), Seq("event_type"), "left")
      .select(col("event_type"),
        col("est").isNotNull.as("found"),
        (col("est").isNotNull && col("est") <= col("f") &&
          col("est") * (k + 1) >= col("f") * (k + 1) - col("n"))
          .as("est_ok"))
      .orderBy("event_type")
  }

  /** Streaming sessionization via flatMapGroupsWithState: a session
    * closes after 30 min (event time) without activity. Two close
    * paths: a later event of the same user ≥ 30 min after the previous
    * (gap rule, µs precision), or the EventTimeTimeout fires once the
    * watermark passes lastSeen + 30 min (ms precision, Spark's strict
    * `timeout < watermark` eviction rule) — which emits the session
    * AND REMOVES the state, so an idle user costs nothing forever.
    * Requires a watermark upstream (callers attach
    * `withWatermark("ts", …)` before projecting to [[Ev]]; the
    * EventTimeWatermarkExec node observes the column there, so the
    * projection dropping it is harmless). State per key is one
    * (lastSeen µs, count) pair — bounded, store-partitioned, evicted.
    */
  def sessionize(ds: Dataset[SEv]): Dataset[Session] = {
    import ds.sparkSession.implicits._
    val gapUs = 30L * 60 * 1000000
    val gapMs = gapUs / 1000
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long), Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[SEv], state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            // Watermark passed lastSeen + gap: the open session is
            // definitively closed (any still-admissible late event
            // would have ts ≥ watermark > lastSeen + gap, i.e. it
            // starts a NEW session). Emit and evict.
            val (_, n) = state.get
            state.remove()
            Iterator.single(Session(user, n, closed = true))
          } else {
            // Within a micro-batch events may arrive unordered: sort.
            val sorted = evs.toSeq.sortBy(e => (e.us, e.event_id))
            var (last, n) = state.getOption.getOrElse((Long.MinValue, 0L))
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              if (n > 0 && e.us - last >= gapUs) {
                closed += Session(user, n, closed = true)
                n = 0
              }
              n += 1
              last = e.us
            }
            state.update((last, n))
            // Close the open session when the watermark passes
            // lastSeen + gap. Spark rejects a timeout at or below the
            // current watermark; the max() clamp covers the multi-
            // batch case where the session is already overdue — it
            // then fires on the next watermark advance.
            state.setTimeoutTimestamp(
              math.max(last / 1000 + gapMs, state.getCurrentWatermarkMs() + 1))
            closed.result().iterator
          }
      }
  }
}
