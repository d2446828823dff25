package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** [EXT] Structured Streaming surface over the `events` stream
  * (SURVEY §2.3/§2.6 M6). The reference host engine (DuckDB) is batch-only,
  * so streaming is a Spark-native extension: watermarks, tumbling/sliding/
  * session windows, and custom state via flatMapGroupsWithState.
  *
  * Every transform here takes a DataFrame so the same code runs in a
  * `readStream` pipeline and in batch replay — the batch-equivalence tests
  * in StreamingSpec rely on that.
  */
object Streams {

  /** Event row shape used by the typed stateful operators. */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(sessionId: Long, lastTs: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long, total_value: Double)

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Tumbling 5-minute counts per event type, 10-minute watermark.
    * In append mode a window emits once its watermark passes — the
    * streaming twin of the ev02 batch query. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
              col("event_type"), col("n"), col("total_value"))

  /** Sliding window (10-minute window, 5-minute slide) event counts. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
              col("event_type"), col("n"))

  /** Built-in session windows (30-minute gap) per user. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("n_events"), col("session_value"))

  /** Custom sessionization with explicit state: assigns consecutive
    * session ids per user with a 30-minute inactivity gap. Works on a
    * stream via flatMapGroupsWithState; the batch twin is the ev01 query.
    *
    * Note: within a micro-batch events are sorted by event_id before the
    * state fold, so replay determinism holds for the batch-equivalence
    * test (a production stream would rely on source ordering per key).
    */
  def sessionizeStateful(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMicros = 1800L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.event_id)
          var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          val out = scala.collection.mutable.Map.empty[Long, (Long, Double)]
          sorted.foreach { e =>
            val tsMicros = e.ts.getTime * 1000L
            val sid = if (st.lastTs == Long.MinValue || tsMicros - st.lastTs > gapMicros)
              st.sessionId + 1 else st.sessionId
            st = SessionState(sid, tsMicros)
            val (n, v) = out.getOrElse(sid, (0L, 0.0))
            out(sid) = (n + 1, v + e.value)
          }
          state.update(st)
          out.toSeq.sortBy(_._1).map { case (sid, (n, v)) => SessionOut(userId, sid, n, v) }.iterator
      }
  }

  /** File-source stream over a parquet directory whose files already
    * carry microsecond timestamps (prepare the fixture with
    * `Tables.load(..., "events").write.parquet(dir)` — the raw fixture's
    * TIMESTAMP(NANOS) is not streamable directly). */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema)
      .parquet(dir)

  /** Run a streaming query to completion against a finite source and
    * return the collected result from the in-memory sink. */
  def runToCompletion(df: DataFrame, name: String, mode: String = "append"): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }

  case class UserStat(user_id: Long, n_events: Long, total_value: Double)

  /** Running per-user profile via the transformWithState API (Spark 4's
    * successor to flatMapGroupsWithState): explicit named ValueStates,
    * one updated UserStat emitted per user per micro-batch. */
  class UserStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserStat] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, ValueState}
    import org.apache.spark.sql.{Encoders => E}
    @transient private var nState: ValueState[Long] = _
    @transient private var vState: ValueState[Double] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: TimeMode): Unit = {
      nState = getHandle.getValueState[Long]("n", E.scalaLong, TTLConfig.NONE)
      vState = getHandle.getValueState[Double]("v", E.scalaDouble, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[UserStat] = {
      var n = if (nState.exists()) nState.get() else 0L
      var v = if (vState.exists()) vState.get() else 0.0
      rows.foreach { e => n += 1; v += e.value }
      nState.update(n)
      vState.update(v)
      Iterator.single(UserStat(key, n, v))
    }
  }

  /** transformWithState pipeline over the typed event stream. */
  def userStats(events: Dataset[Event]): Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append(),
        implicitly[org.apache.spark.sql.Encoder[UserStat]])
  }

  /** Streaming exact dedup: drop duplicate event_ids, with state bounded
    * by the watermark (duplicates arriving later than the delay are
    * outside the guarantee — the standard streaming-dedup contract). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases enriched with the same user's
    * view events from the preceding hour. Both sides watermarked so join
    * state is bounded; the time-range condition lets Spark expire rows. */
  def purchaseViewJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
              col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "10 minutes")
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
              col("event_id").as("view_id"))
      .withWatermark("v_ts", "10 minutes")
    purchases.join(views,
      col("p_user") === col("v_user") &&
      col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
      col("v_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("view_id"))
  }

  /** Stream into a Lance dataset: every non-empty micro-batch commits one
    * new dataset version (append), so the sink is queryable mid-stream and
    * each epoch is time-travelable via versionAsOf — the streaming twin of
    * the reference's COPY TO (R6-R8). Exactly-once within a batch comes
    * from the atomic manifest commit; foreachBatch re-delivery would
    * append a duplicate version (documented at-least-once semantics, as
    * with any non-idempotent foreachBatch sink). */
  def lanceSink(df: DataFrame, path: String,
                checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    lanceSink(df, path, checkpoint, Nil)

  /** Partitioned variant: every micro-batch appends under the SAME
    * declared value-partitioned layout, so the growing dataset keeps its
    * per-fragment partition values and the scan keeps reporting
    * KeyGroupedPartitioning — streaming ingestion lands DIRECTLY in the
    * storage-partitioned-join-ready layout (no post-hoc rewrite). */
  def lanceSink(df: DataFrame, path: String, checkpoint: String,
                partitionBy: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val w = batch.write.format("lance").mode("append")
          (if (partitionBy.nonEmpty) w.option("partitionBy", partitionBy.mkString(","))
           else w).save(path)
        }
      }
      .start()

  /** Continuous ingestion with an incrementally-maintained rollup: each
    * micro-batch appends to a stable-row-id lance dataset, then advances
    * a [[graft.operators.MatView]] through the change feed — the landed
    * table AND its aggregate view stay consistent per epoch, with
    * refresh work proportional to the batch (never the table). The
    * streaming face of `CALL lance.create_matview/refresh_matview`. */
  def lanceSinkWithMatView(df: DataFrame, path: String, checkpoint: String,
                           mvPath: String, keys: Seq[String],
                           sums: Seq[String]): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          batch.write.format("lance").mode("append")
            .option("stableRowIds", "true").save(path)
          val conf = s.sessionState.newHadoopConf()
          val (fs, mp) = graft.sources.lance.LanceFormat.fileSystem(mvPath, conf)
          if (fs.exists(mp)) graft.operators.MatView.refresh(s, mvPath)
          else graft.operators.MatView.create(s, path, mvPath, keys, sums)
        }
        ()
      }
      .start()
}
