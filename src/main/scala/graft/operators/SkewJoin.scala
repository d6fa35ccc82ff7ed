package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew-mitigation shape for joins whose
  * key distribution is too hot for AQE's runtime skew splitting (AQE
  * splits oversized PARTITIONS of a sort-merge join, but a single
  * pathological key — one domain, one null-ish default, one celebrity
  * user — still lands every probe row on the tasks holding that key's
  * build rows).
  *
  * Salting spreads each key over `salts` sub-keys: the large (skewed)
  * side gets a deterministic salt from `saltSource`, the small side is
  * replicated once per salt value, and the join runs on
  * (key, salt) — a hot key's rows now flow through `salts` independent
  * tasks instead of one. Cost: the replicated side scans `salts`×, so
  * keep it the smaller input and `salts` near the observed skew factor.
  *
  * Determinism: the salt is `pmod(hash, salts)` of caller-chosen
  * columns (e.g. a unique row id), not `rand()` — reruns produce the
  * identical distribution AND the identical result set, which is what
  * makes the operator gateable.
  *
  * Column-name contract: column sets must be disjoint — pre-alias.
  */
object SkewJoin {

  def saltedJoin(
      large: DataFrame,
      replicated: DataFrame,
      largeKey: String,
      replicatedKey: String,
      saltSource: Column,
      salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val overlap = large.columns.toSet.intersect(replicated.columns.toSet)
    require(overlap.isEmpty,
      s"saltedJoin: column collision ${overlap.mkString(", ")} — alias before joining")
    val l = large.withColumn("_lsalt", pmod(saltSource, lit(salts)).cast("int"))
    val r = replicated.withColumn("_rsalt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, col(largeKey) === col(replicatedKey) && col("_lsalt") === col("_rsalt"))
      .drop("_lsalt", "_rsalt")
  }
}
