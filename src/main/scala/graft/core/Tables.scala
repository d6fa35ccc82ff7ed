package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * `events.ts` has shipped as two physical types across driver rounds:
  * TIMESTAMP(NANOS), which Spark reads only as a raw long
  * (`spark.sql.legacy.parquet.nanosAsLong` — GraftSession/Verify/Bench
  * set it) and needs an exact ns→µs conversion here, and plain
  * timestamp[us], which arrives as TIMESTAMP_NTZ and only needs the
  * instant cast (sessions run UTC, so the wall-clock reading is the
  * same instant the nanos path produced). Branch on the type actually
  * read so both vintages load identically.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    else df
  }
}
