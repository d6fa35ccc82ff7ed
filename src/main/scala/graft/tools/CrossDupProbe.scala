package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.Dedup
import graft.streaming.StreamingState

/** One-JVM A/B for the d10s_cross_dup_stream cost profile (QueryBench
  * drifts ±40% between sessions — only same-JVM interleaved reps are
  * comparable). Times the full gate shape (4 MemoryStream ticks over
  * sf0.1 documents, stream = 2/3 of docs, static reference = 1/3)
  * under three static-side treatments:
  *   - nocache: the reference banding recomputed by every micro-batch
  *   - lazy:    `.cache()` materialized by batch 0 (the shipped path)
  *   - eager:   cache + count() before the stream starts
  * Interleaved reps; min per variant. Answers the round-6 watch item:
  * is the static side recomputed per batch (nocache ≫ lazy proves the
  * cache is doing its job), and does eager materialization move the
  * total at all.
  */
object CrossDupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val streamRows = docs.filter(col("doc_id") % 3 =!= 0)
      .orderBy(col("doc_id")).collect()
    val refDocs = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text")).cache()
    refDocs.count() // corpus load out of the timed region for all variants

    def runOnce(mode: String): Long = {
      val stream = MemoryStream[Row](Encoders.row(docs.schema), sqlCtx)
      def toBands(df: DataFrame, idOut: String, sigOut: String) =
        Dedup.bandBucketsFromSigs(
          df.select(col("doc_id").as(idOut),
            Dedup.minhashSignature(col("text"), 3, 16).as(sigOut)),
          idOut, sigOut, 16, 4)
      val out = mode match {
        case "nocache" =>
          val refBands = toBands(refDocs, "ref_id", "_rsig")
          toBands(stream.toDF(), "id", "_sig")
            .join(refBands, Seq("band", "bh"))
            .withColumn("est_jaccard",
              Dedup.sigAgreement(col("_sig"), col("_rsig"), 16))
            .filter(col("est_jaccard") >= lit(0.5))
            .select(col("id"), col("ref_id"), col("est_jaccard"))
        case "lazy" =>
          StreamingState.crossCorpusDupStream(stream.toDF(), refDocs,
            "doc_id", "text", n = 3, numHashes = 16, bands = 4, threshold = 0.5)
        case "eager" =>
          val refBands = toBands(refDocs, "ref_id", "_rsig").cache()
          refBands.count()
          toBands(stream.toDF(), "id", "_sig")
            .join(refBands, Seq("band", "bh"))
            .withColumn("est_jaccard",
              Dedup.sigAgreement(col("_sig"), col("_rsig"), 16))
            .filter(col("est_jaccard") >= lit(0.5))
            .select(col("id"), col("ref_id"), col("est_jaccard"))
      }
      val name = s"cdp_${System.nanoTime()}"
      val ckpt = Files.createTempDirectory("cdp-ckpt").toString
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = out.writeStream.format("memory").queryName(name)
          .outputMode("append").option("checkpointLocation", ckpt).start()
        try {
          val per = math.max(1, math.ceil(streamRows.length / 4.0).toInt)
          streamRows.grouped(per).foreach { b =>
            stream.addData(b.toSeq); q.processAllAvailable()
          }
        } finally q.stop()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      val n = spark.table(name).count()
      spark.catalog.clearCache()
      refDocs.cache(); refDocs.count() // keep the corpus hot for the next rep
      n
    }

    val variants = Seq("nocache", "lazy", "eager")
    variants.foreach(runOnce) // warmup each code path once
    val times = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    (1 to 4).foreach { _ =>
      variants.foreach { v =>
        val t0 = System.nanoTime()
        val n = runOnce(v)
        val t = (System.nanoTime() - t0) / 1e9
        times(v) = t :: times(v)
        println(f"rep $v%-8s $t%6.2f s rows=$n")
      }
    }
    variants.foreach { v =>
      println(f"MIN $v%-8s ${times(v).min}%6.2f s  median=${times(v).sorted.apply(times(v).size / 2)}%6.2f s")
    }
    spark.stop()
  }
}
