package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join via bucket expansion —
  * the standard trick for making a range predicate shuffle-joinable.
  *
  * A naive `l.p BETWEEN r.lo AND r.hi` join has no equi-key, so Spark
  * plans a broadcast-nested-loop or cartesian product — O(|L|·|R|)
  * comparisons, a non-starter at corpus scale. Bucketing restores an
  * equi-key: points land in bucket `p div w`, intervals explode to the
  * buckets they overlap (`lo div w .. hi div w`), the join runs as an
  * ordinary hash/sort-merge equi-join on (bucket [, keys]), and the
  * exact `BETWEEN` re-check keeps only true containments. Each true
  * pair is produced exactly once (a point has exactly ONE bucket).
  *
  * Scale shape: one shuffle per side keyed by (bucket, equi-keys); the
  * interval side's row count multiplies by ~(interval length / `w`), so
  * pick `w` near the MEDIAN interval length — expansion stays a small
  * constant while each bucket's candidate set stays local. Wide-outlier
  * intervals (expansion skew) are AQE's skew-join case; the equi-keys,
  * when present, keep hot buckets partitionable.
  *
  * The streaming twin is
  * [[graft.streaming.StreamingState.intervalJoinStream]] (watermarked
  * stream-stream); this is the batch/backfill formulation.
  *
  * Column-name contract: `left` and `right` column sets must be
  * disjoint (same rule as the streaming twin) — pre-alias collisions.
  */
object RangeJoin {

  def pointInRange(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Long,
      equiKeys: Seq[(String, String)] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"pointInRange: column collision ${overlap.mkString(", ")} — alias before joining")
    // integer `div` keeps the bucket math exact over the full long
    // range (float division drifts past 2^53 — µs timestamps qualify)
    val lb = left.withColumn("_pb", expr(s"`$pointCol` div ${bucketWidth}L"))
    val rx = right
      .filter(col(loCol) <= col(hiCol))
      .withColumn("_ib", explode(expr(
        s"sequence(`$loCol` div ${bucketWidth}L, `$hiCol` div ${bucketWidth}L)")))
    val cond = (Seq(col("_pb") === col("_ib")) ++
      equiKeys.map { case (l, r) => col(l) === col(r) } ++
      Seq(col(pointCol) >= col(loCol), col(pointCol) <= col(hiCol)))
      .reduce(_ && _)
    lb.join(rx, cond).drop("_pb", "_ib")
  }
}
