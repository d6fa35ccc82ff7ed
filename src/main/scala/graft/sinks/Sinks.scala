package graft.sinks

import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.{Transforms, ViewConfig, Views}
import graft.streaming.ChannelRuntime

/** Egress operators (SURVEY.md §2.2).
  *
  * K1 (Kafka publish) and K3 (SQL insert) are transforms + a writer:
  * the transform halves are pure Catalyst (unit-tested on static
  * frames); the writers are `foreachBatch`/`jdbc` wiring that needs
  * live endpoints. K4 (Perspective tables) becomes [[ViewServer]]: a
  * periodically refreshed, bounded, upserted materialization of view
  * configs over channel state — which is exactly what the reference's
  * Arrow/Perspective buffer loop does (perspective.py:491-515).
  */
object Sinks {

  /** K1 — Kafka publish serialization: selected columns → one JSON
    * `value` with optional engine-timestamp envelope (reference
    * kafka.py:259-283; envelope json_converter.py:45-49).
    */
  def toKafkaValue(
      df: DataFrame,
      cols: Seq[String],
      keyCol: Option[String] = None,
      envelopeTs: Option[String] = None,
      serde: graft.core.PayloadSerde = graft.core.JsonSerde): DataFrame = {
    val payload = envelopeTs match {
      case Some(tsCol) => serde.encode(struct(
        struct(cols.map(col): _*).as("data"),
        col(tsCol).as("csp_timestamp")))
      case None => serde.encode(struct(cols.map(col): _*))
    }
    val base = df.select(payload.as("value"))
    keyCol.map(k => df.select(col(k).cast("string").as("key"), payload.as("value")))
      .getOrElse(base)
  }

  /** K1 — writer wiring (needs a broker at runtime). */
  def kafkaWriter(df: DataFrame, bootstrapServers: String, topic: String,
      checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    df.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** K3 — SQL insert sink transform: field selection, renaming,
    * constant augmentation, nested values JSON-stringified (reference
    * modules/sql.py:61-185 ChannelSchemaConfig).
    */
  def sqlSinkProjection(
      df: DataFrame,
      fields: Seq[String],
      rename: Map[String, String] = Map.empty,
      augment: Map[String, Any] = Map.empty): DataFrame = {
    val projected = Transforms.renameAugment(df, fields, rename, augment)
    // nested struct/array/map columns -> JSON strings (sql.py:141-176)
    val jsonified = projected.schema.fields.map { f =>
      f.dataType match {
        case _: org.apache.spark.sql.types.StructType |
             _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType => to_json(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }
    projected.select(jsonified.toSeq: _*)
  }

  /** K3 — per-batch insert with bounded retry (sql.py retry loop).
    * The writer function is injected so tests (and JDBC-less builds)
    * can supply their own terminal write.
    */
  def insertWithRetry(batch: DataFrame, retries: Int)(write: DataFrame => Unit): Unit = {
    require(retries >= 0, s"retries must be >= 0, got $retries")
    var attempt = 0
    var done = false
    var lastErr: Throwable = null
    while (!done && attempt <= retries) {
      try { write(batch); done = true }
      catch { case NonFatal(e) => lastErr = e; attempt += 1 }
    }
    if (!done) throw lastErr
  }

  /** K3 — exactly-once batch insert. [[insertWithRetry]] alone is
    * at-least-once: a write that dies MID-batch leaves a partial
    * prefix in the target, and the retry re-inserts it — duplicates.
    * This wrapper makes the replay idempotent the standard
    * `foreachBatch` way: every attempt first clears whatever this
    * batch's epoch already wrote, then re-inserts the whole batch
    * under that epoch. The reference gets the same guarantee from the
    * DB transaction around its executemany (sql.py retry loop); the
    * epoch scope supplies it for targets without transactions (a
    * transactional target can make `clearEpoch` a no-op). Epoch ids
    * come from `foreachBatch`'s batchId, which Structured Streaming
    * replays stably across restarts — so the guarantee holds across
    * both in-JVM retries and restart replays.
    */
  def insertExactlyOnce(batch: DataFrame, epochId: Long, retries: Int)(
      clearEpoch: Long => Unit)(write: (DataFrame, Long) => Unit): Unit =
    insertWithRetry(batch, retries) { b =>
      clearEpoch(epochId)
      write(b, epochId)
    }

  /** K6 — logging sink: log every tick of selected channels
    * (reference modules/logging/stdlib.py:366-394).
    */
  def logChannels(
      runtime: ChannelRuntime,
      channels: Seq[String],
      log: String => Unit = s => println(s)): Unit =
    runtime.addListener { (ch, rows) =>
      if (channels.contains(ch)) rows.foreach(r => log(s"[$ch] $r"))
    }
}

/** K4 — Perspective-table analogue: named views (group/pivot/agg/
  * sort/filter/limit/index) maintained over channel state, refreshed
  * on demand or on an interval, served as row snapshots. `limit`
  * bounds retention (ring buffer) and `index` upserts by key exactly
  * like the reference's Perspective tables (perspective.py:149-151,
  * 210-217).
  */
object ViewServer {
  /** Top-level (not inner) so pattern matches need no outer-instance
    * check — the nested form trips the unchecked-outer-ref warning. */
  final case class ViewDef(channel: String, config: ViewConfig)

  /** Default snapshot cap for views with no explicit `limit`, no
    * `index`, and no aggregation — the reference's `default_limit`
    * ("i.e. 1000", perspective.py:210, applied at table mount,
    * perspective.py:307). Without it an identity view over a busy
    * channel collects the whole channel into driver memory every
    * refresh — unbounded at exactly the place the reference ring-
    * buffers. */
  val DefaultLimit = 10000
}

final class ViewServer(
    runtime: ChannelRuntime,
    defaultLimit: Int = ViewServer.DefaultLimit) {
  import ViewServer.ViewDef

  private val views = new TrieMap[String, ViewDef]
  private val snapshots = new TrieMap[String, (Seq[Row], org.apache.spark.sql.types.StructType)]

  def define(name: String, channel: String, config: ViewConfig): Unit =
    views.put(name, ViewDef(channel, config))

  def names: Seq[String] = views.keys.toSeq.sorted

  /** The channel a view reads — the serving layer needs it to apply
    * the channel's identity filter to table snapshots. */
  def channelOf(name: String): Option[String] = views.get(name).map(_.channel)

  /** Views bounded by their own config: explicit limit, upsert index
    * (one row per key), or aggregation (one row per group). Anything
    * else gets the ring-buffer cap — most recent `defaultLimit` rows
    * by arrival seq, the reference's Perspective table `limit`
    * semantics (perspective.py:149-151). */
  private def selfBounded(v: ViewConfig): Boolean =
    v.limit.nonEmpty || v.index.nonEmpty || v.groupBy.nonEmpty || v.aggregates.nonEmpty

  /** Recompute all views from current channel state. Failures keep the
    * previous snapshot but are LOGGED — a misconfigured view (typo'd
    * column, bad aggregate) must not fail silently forever.
    */
  def refresh(): Unit = views.foreach { case (name, vd) =>
    try {
      val raw = runtime.stateFrame(vd.channel)
      val state =
        if (selfBounded(vd.config)) raw
        else raw.orderBy(col(ChannelRuntime.SeqCol).desc).limit(defaultLimit)
      val compiled = Views.compile(state, vd.config, seqCol = Some(ChannelRuntime.SeqCol))
      snapshots.put(name, (compiled.collect().toSeq, compiled.schema))
    } catch {
      case NonFatal(e) =>
        Console.err.println(s"[graft] view '$name' refresh failed: ${e.getMessage}")
    }
  }

  def snapshot(name: String): Seq[Row] = snapshots.get(name).map(_._1).getOrElse(Nil)

  /** Snapshot rows with the compiled view's schema (None before the
    * first successful refresh). */
  def snapshotWithSchema(name: String): Option[(Seq[Row], org.apache.spark.sql.types.StructType)] =
    snapshots.get(name)

  /** The snapshot as an Arrow IPC stream — the payload a Perspective
    * browser table loads directly (reference perspective.py:71-100
    * ships pyarrow record batches the same way). None until the first
    * successful refresh (schema comes from the compiled view). The
    * gateway's `/table/{name}/arrow` route applies identity filtering
    * first and so encodes via [[snapshotWithSchema]]; this is the
    * unfiltered programmatic surface.
    */
  def snapshotArrow(name: String): Option[Array[Byte]] =
    snapshots.get(name).map { case (rows, schema) =>
      org.apache.spark.sql.graft.ArrowBridge.toArrowStream(rows, schema)
    }

  /** Periodic refresh thread (reference update_interval, default 2s). */
  def startPeriodicRefresh(intervalMillis: Long = 2000L): Thread = {
    val t = new Thread(() => {
      while (!Thread.currentThread().isInterrupted) {
        refresh()
        try Thread.sleep(intervalMillis)
        catch { case _: InterruptedException => Thread.currentThread().interrupt() }
      }
    }, "graft-view-refresh")
    t.setDaemon(true)
    t.start()
    t
  }
}
