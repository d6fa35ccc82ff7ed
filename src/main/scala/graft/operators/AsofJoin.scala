package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for each left row, attach the latest right row with
  * the same key and `rightTime <= leftTime` (backward), or the
  * earliest with `rightTime >= leftTime` (forward).
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
  * Null / tie semantics (match DuckDB's ASOF JOIN, the oracle):
  *  - right rows with a null time NEVER match (filtered up front);
  *  - left rows with a null time match nothing (they sort before all
  *    right rows in either direction);
  *  - right rows at exactly the left time DO match (`<=` / `>=`);
  *  - among right rows tied on (key, time), `rightTieBreak` (e.g. an
  *    arrival-seq column) picks the winner deterministically — pass it
  *    whenever (key, time) is not unique, or byte-determinism is lost.
  */
object AsofJoin {

  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: Option[String] = None): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime, rightTieBreak,
      backward = true)

  def asofForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: Option[String] = None): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime, rightTieBreak,
      backward = false)

  private def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: Option[String],
      backward: Boolean): DataFrame = {
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
    val r = right
      .filter(col(rightTime).isNotNull) // null right times never match
      .select(
        col(rightKey).as("_k"), col(rightTime).cast("timestamp").as("_t"),
        lit(0).as("_side"),
        lit(null).cast(l.schema("_l").dataType).as("_l"), rStruct.as("_r"))

    // Null left times sort before every (non-null) right row in both
    // directions -> they accumulate no match.
    val timeOrder: Column = if (backward) col("_t").asc_nulls_first else col("_t").desc_nulls_first
    val tieOrder: Seq[Column] =
      rightTieBreak.map(c =>
        if (backward) col("_r").getField(c).asc_nulls_first
        else col("_r").getField(c).desc_nulls_last).toSeq
    val w = Window.partitionBy("_k")
      .orderBy((timeOrder +: col("_side").asc +: tieOrder): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l.$c").as(c)) ++
        rightCols.map(c => col(s"_match.$c").as(c)): _*)
  }
}
