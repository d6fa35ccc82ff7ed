package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the latest right
  * row with the same key and `rightTime <= leftTime`.
  *
  * The reference framework has no join operator at all (SURVEY.md §2.5
  * — analytics are delegated to embedded engines); an as-of join is the
  * canonical missing piece for event/state enrichment, so it is built
  * here as a first-class operator.
  *
  * Implementation is the scalable union-sort formulation, not a range
  * join: tag both inputs, union them, and carry the last right payload
  * forward inside one `Window.partitionBy(key).orderBy(time, side)` —
  * exactly ONE shuffle (hash by key) and one partition-local sort, no
  * per-row range probing, no broadcast requirement on either side.
  * This survives a 100× scale-up: both inputs stream through the same
  * exchange, and skewed keys are handled by AQE.
  *
  * Right rows sort before left rows at equal timestamps, so a right
  * row exactly at the left time IS matched (`<=` semantics, same as
  * DuckDB's ASOF JOIN which serves as the oracle).
  */
object AsofJoin {

  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq
    val overlap = leftCols.toSet.intersect(rightCols.toSet)
    require(overlap.isEmpty, s"Overlapping column names: $overlap")

    val rStruct = struct(rightCols.map(col): _*)
    val rType = right.select(rStruct.as("_r")).schema("_r").dataType

    val l = left.select(
      col(leftKey).as("_k"), col(leftTime).cast("timestamp").as("_t"),
      lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"), lit(null).cast(rType).as("_r"))
    val r = right.select(
      col(rightKey).as("_k"), col(rightTime).cast("timestamp").as("_t"),
      lit(0).as("_side"),
      lit(null).cast(l.schema("_l").dataType).as("_l"), rStruct.as("_r"))

    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        rightCols.map(c => col(s"_match.$c").as(c)): _*)
  }

  /** Forward as-of join: earliest right row with `rightTime >=
    * leftTime`. Same single-shuffle shape, reversed time order.
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq
    val rStruct = struct(rightCols.map(col): _*)
    val rType = right.select(rStruct.as("_r")).schema("_r").dataType
    val l = left.select(
      col(leftKey).as("_k"), col(leftTime).cast("timestamp").as("_t"),
      lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_l"), lit(null).cast(rType).as("_r"))
    val r = right.select(
      col(rightKey).as("_k"), col(rightTime).cast("timestamp").as("_t"),
      lit(0).as("_side"),
      lit(null).cast(l.schema("_l").dataType).as("_l"), rStruct.as("_r"))
    val w = Window.partitionBy("_k").orderBy(col("_t").desc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        rightCols.map(c => col(s"_match.$c").as(c)): _*)
  }
}
