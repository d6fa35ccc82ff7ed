package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions
import graft.pipeline.Curation

/** A/B for the tx17 vocab-membership constant (round-9 task 4): the
  * hash-set [[graft.functions.InVocabCountExpr]] vs the previous
  * `array_contains`-over-literal form, same documents table, same
  * vocabulary, one JVM, min-of-3 per arm. Run with vocab sizes 64 and
  * 50_000 to see the old form's O(|vocab|)-per-token constant and the
  * new form's flat one.
  *
  *   sbt -batch "runMain graft.tools.VocabBenchAB /root/testdata/sf0.1"
  */
object VocabBenchAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents").select("lang", "text").cache()
    docs.count() // materialize once so both arms time compute, not IO

    def oldForm(vocab: Seq[String]) = {
      val vocabArr = array(vocab.map(lit): _*)
      val toks = TextFunctions.tokens(col("text"))
      docs.select(col("lang"),
          size(toks).cast("long").as("_nt"),
          size(filter(toks, t => array_contains(vocabArr, t))).cast("long").as("_iv"))
        .groupBy("lang").agg(sum("_nt").as("n_tokens"), sum("_iv").as("n_in_vocab"))
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    for (n <- Seq(64, 50000)) {
      val vocab = Seq("the", "a", "of", "to", "and", "in", "is", "it") ++
        (1 to (n - 8)).map(i => s"vocabfiller$i")
      // warmup both arms once, then min-of-3
      val newArm = Curation.vocabCoverage(docs, Seq("lang"), "text", vocab)
      newArm.collect(); oldForm(vocab).collect()
      val tNew = (1 to 3).map(_ => time(newArm.collect())).min
      val tOld = (1 to 3).map(_ => time(oldForm(vocab).collect())).min
      // both arms must agree exactly — this is an optimization, not a recall trade
      val a = newArm.collect().map(_.toSeq).sortBy(_.toString)
      val b = oldForm(vocab).collect().map(_.toSeq).sortBy(_.toString)
      require(a.sameElements(b), s"arms disagree at vocab=$n")
      println(f"vocab=$n%6d  hashset=$tNew%7.3f s  array_contains=$tOld%7.3f s  speedup=${tOld / tNew}%6.1fx")
    }
    spark.stop()
  }
}
