package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.pipeline.{Clustering, Similarity}

/** Hot ANN index update: the refit stream ([[StreamingState.kmeansRefitStream]],
  * c4s) composed with ANN serving ([[StreamingState.annQueryStream]], s7s) —
  * the quantizer is swapped UNDER the running query stream without a restart.
  *
  * The mechanics are the standard Spark "refresh the static side in
  * foreachBatch" recipe: a stream-static join bakes the static plan (and the
  * quantizer literals) in at stream start, so a literal swap cannot reach a
  * running `annQueryStream`. Serving therefore goes through `foreachBatch`,
  * and each query micro-batch is answered as a BATCH IVF search against the
  * snapshot current at that batch's start.
  *
  * Consistency window — one micro-batch: [[answer]] reads the
  * `AtomicReference` snapshot exactly once, and the snapshot bundles the
  * quantizer WITH its matching cached cell assignments, so a batch is never
  * answered half under version v and half under v+1 (no torn index). A swap
  * completing mid-batch takes effect at the next batch boundary. Queries are
  * stateless (s7s contract: re-sending a query re-answers it), so versions
  * need no reconciliation across batches.
  *
  * At cluster scale the swap cost is one narrow assignment pass over the
  * corpus (argmax over k centroid literals, zero Exchange) plus a cache
  * materialization — the same cost `annQueryStream` pays once at stream
  * start; serving continues against the old snapshot while the new one
  * builds. Reference: the gateway's restart-to-reconfigure model
  * (csp_gateway has no online index; this is the Spark-native upgrade).
  */
final class HotAnnIndex(
    corpus: DataFrame,
    idCol: String,
    vecCol: String,
    initialCents: Array[(Long, Seq[Double])]) {

  /** Quantizer + its matching cached assignment — swapped as one unit. */
  final case class Snapshot(version: Long, cents: Array[(Long, Seq[Double])],
      assigned: DataFrame)

  private def build(version: Long, cents: Array[(Long, Seq[Double])]): Snapshot = {
    require(cents.nonEmpty, "HotAnnIndex needs a non-empty quantizer")
    val assigned = corpus
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("_cv"))
      .withColumn("_cell", Clustering.assignCell(col("_cv"), cents.toIndexedSeq))
      .filter(col("_cell") >= 0)
      .cache()
    assigned.count() // materialize BEFORE the swap: serving never waits on a cold cache
    Snapshot(version, cents, assigned)
  }

  private val ref = new AtomicReference[Snapshot](build(0L, initialCents))

  def current: Snapshot = ref.get()

  /** Answer one query batch against the current snapshot — the batch IVF
    * kernel ([[Similarity.ivfTopK]] semantics: probe `nprobe` nearest cells,
    * cell equi-join, exact cosine, rank cosine desc / cid asc) over the
    * snapshot's cached assignments. Output (qid, cid, cosine, rank).
    */
  def answer(queries: DataFrame, k: Int, nprobe: Int = 1): DataFrame = {
    require(k >= 1 && nprobe >= 1, "HotAnnIndex.answer: k and nprobe must be >= 1")
    val snap = ref.get() // single read: the whole batch sees one version
    val centArr: Column = array(snap.cents.toIndexedSeq.map { case (cid, v) =>
      struct(lit(cid).as("c"), typedLit(v).as("ce"))
    }: _*)
    val probed = queries
      .select(col(idCol).cast("long").as("qid"), col(vecCol).as("_qv"))
      // cell array materialized BELOW the Generate (the tx4 rule)
      .withColumn("_cells", Similarity.topCells(col("_qv"), centArr, nprobe))
      .select(col("qid"), col("_qv"), explode(col("_cells")).as("_cell"))
    val scored = snap.assigned.join(broadcast(probed), Seq("_cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        Similarity.cosine(col("_qv"), col("_cv")).as("cosine"))
      .filter(!isnan(col("cosine")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Swap in a refit quantizer from the c4s partial stream: merge the
    * (cell, shard, n, sums) partials ([[StreamingState.kmeansRefitCentroids]]
    * — k×shards metadata rows), rebuild assignments, then publish
    * atomically. The old snapshot's cache is released non-blocking; an
    * `answer` that already holds it finishes unharmed (unpersist only drops
    * cached blocks — the plan recomputes if needed).
    */
  def swapFrom(refitPartials: DataFrame): Snapshot = {
    val merged = StreamingState.kmeansRefitCentroids(refitPartials)
      .select(col("cell").cast("long"), col("centroid"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    swapTo(merged)
  }

  /** Publish an explicit quantizer (e.g. a batch re-fit). */
  def swapTo(cents: Array[(Long, Seq[Double])]): Snapshot = {
    val old = ref.get()
    val next = build(old.version + 1L, cents)
    ref.set(next)
    old.assigned.unpersist(blocking = false)
    next
  }

  /** Serving loop: each query micro-batch is answered against the snapshot
    * current at its start and handed to `sink`. Start/stop via the returned
    * writer. (`foreachBatch`, so a concurrent [[swapFrom]] lands at a batch
    * boundary — the consistency window documented on the class.)
    */
  def serve(queryStream: DataFrame, k: Int, nprobe: Int = 1)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    queryStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(answer(batch, k, nprobe), batchId)
    }

  def release(): Unit = ref.get().assigned.unpersist(blocking = true)
}
