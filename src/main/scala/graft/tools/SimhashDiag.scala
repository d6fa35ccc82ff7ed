package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: where do simhashPairs candidates come from at
  * sf1 — block-bucket occupancy, candidate count, verified count. */
object SimhashDiag {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"docs = ${docs.count()}")
    val sk = docs.select(col("doc_id").as("_id"),
      graft.pipeline.Dedup.simhash(col("text"), 48).as("_sh"))
    val blocks = sk.select(col("_id"),
      explode(array((0 until 3).map(k => struct(lit(k).as("blk"),
        shiftrightunsigned(col("_sh"), k * 16).bitwiseAND(lit(0xffffL)).as("bv"))): _*)).as("_b"))
      .select(col("_id"), col("_b.blk"), col("_b.bv"))
    val occ = blocks.groupBy("blk", "bv").count()
    println("top block-bucket occupancies:")
    occ.orderBy(col("count").desc).limit(20).collect().foreach(r =>
      println(s"  blk=${r.get(0)} bv=${r.get(1)} n=${r.get(2)}"))
    val candUpper = occ.select(sum(col("count") * (col("count") - 1) / 2)).collect()(0)
    println(s"candidate pairs upper bound (sum nC2 over buckets) = $candUpper")
    spark.stop()
  }
}
// appended diagnostic main: full-sketch group sizes
import org.apache.spark.sql.functions._
object SimhashDiag2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sk = docs.select(col("doc_id").as("_id"),
      graft.pipeline.Dedup.simhash(col("text"), 48).as("_sh"))
    val groups = sk.groupBy("_sh").count()
    println("top identical-sketch groups:")
    groups.orderBy(col("count").desc).limit(10).collect().foreach(r =>
      println(s"  sh=${r.get(0)} n=${r.get(1)}"))
    val truePairsLb = groups.select(sum(col("count") * (col("count") - 1) / 2)).collect()(0)
    println(s"true-pair LOWER bound (identical sketches alone) = $truePairsLb")
    spark.stop()
  }
}
