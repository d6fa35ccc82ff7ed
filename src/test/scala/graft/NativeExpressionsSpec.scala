package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{NativeExpressions, TextFunctions}
import graft.pipeline.Similarity

/** Parity tests: the fused codegen expressions must be bit-identical
  * to their declarative (built-in-composed) specifications.
  */
class NativeExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("polyhash: native == declarative on varied strings, null-safe") {
    val df = Seq("", "a", "abc", "the quick brown fox", "x y z 123 !?", null)
      .toDF("s")
    val r = df.select(
      TextFunctions.polyHash($"s").as("native"),
      TextFunctions.polyHashDeclarative($"s").as("decl")).collect()
    r.foreach { row =>
      assert(row.isNullAt(0) === row.isNullAt(1))
      if (!row.isNullAt(0)) assert(row.getLong(0) === row.getLong(1))
    }
  }

  test("cosine: native == declarative bitwise on float vectors") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
      (Array(0.1f, 0.0f, -0.3f), Array(0.9f, 0.2f, 0.4f))
    ).toDF("a", "b")
    df.select(
      Similarity.cosine($"a", $"b").as("n"),
      Similarity.cosineDeclarative($"a", $"b").as("d"))
      .collect().foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("cosine: length mismatch yields null (declarative parity), mixed types honored") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val r = df.select(
      Similarity.cosine($"a", $"b").as("n"),
      Similarity.cosineDeclarative($"a", $"b").as("d")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    val mixed = Seq((Array(1.0f, 0.0f), Array(1.0, 0.0))).toDF("a", "b")
    assert(mixed.select(Similarity.cosine($"a", $"b")).collect().head.getDouble(0) === 1.0)
  }

  test("minhash + simhash: native == declarative on real corpus") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val r = docs.select(
      graft.pipeline.Dedup.minhashSignature($"text").as("mn"),
      graft.pipeline.Dedup.minhashSignatureDeclarative($"text").as("md"),
      graft.pipeline.Dedup.simhash($"text").as("sn"),
      graft.pipeline.Dedup.simhashDeclarative($"text").as("sd")).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getSeq[Long](0) === row.getSeq[Long](1))
      assert(row.getLong(2) === row.getLong(3))
    }
  }

  test("shingle hashes: fused kernel == declarative distinct-hash set on real corpus + edges") {
    val decl = (t: org.apache.spark.sql.Column) => array_sort(array_distinct(
      transform(graft.pipeline.Dedup.shingles(t, 3), s => TextFunctions.polyHash(s))))
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val r = docs.select(
      array_sort(graft.pipeline.Dedup.shingleHashes($"text", 3)).as("fused"),
      decl($"text").as("decl")).collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getSeq[Long](0) === row.getSeq[Long](1)))
    // spacing edges: consecutive/leading/trailing spaces produce empty
    // tokens whose concat_ws reconstruction matches raw substrings
    val edge = Seq("", "a", "a b", "a b c", "a  b c", " a b c ", "a b c d e")
      .toDF("text").select(
        array_sort(graft.pipeline.Dedup.shingleHashes($"text", 3)).as("fused"),
        decl($"text").as("decl")).collect()
    edge.foreach(row => assert(row.getSeq[Long](0) === row.getSeq[Long](1)))
  }

  test("positional gram hashes: fused kernel == declarative, order + duplicates preserved") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val r = docs.select(
      graft.pipeline.Dedup.positionalGramHashes($"text", 10).as("fused"),
      graft.pipeline.Dedup.positionalGramHashesDeclarative($"text", 10).as("decl")).collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getSeq[Long](0) === row.getSeq[Long](1)))
    // spacing + length edges: under-w texts are empty; duplicate grams
    // ("a b a b a b" has repeated 2-grams) keep their multiplicity
    val edge = Seq("", "a", "a b", "a b a b a b", "a  b c", " a b c ")
      .toDF("text").select(
        graft.pipeline.Dedup.positionalGramHashes($"text", 2).as("fused"),
        graft.pipeline.Dedup.positionalGramHashesDeclarative($"text", 2).as("decl")).collect()
    edge.foreach(row => assert(row.getSeq[Long](0) === row.getSeq[Long](1)))
    val rep = edge(3).getSeq[Long](0)
    assert(rep.length === 5 && rep.distinct.length < rep.length)
  }

  test("winnowing fingerprint: native == declarative on real corpus + edges") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val r = docs.select(
      TextFunctions.fingerprint($"text").as("fn"),
      TextFunctions.fingerprintDeclarative($"text").as("fd")).collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getSeq[Long](0) === row.getSeq[Long](1)))
    // short-text edge: below k+w-1 chars → empty on both sides
    val edge = Seq("", "tiny", "exactly 10", "exactly 11.").toDF("text").select(
      TextFunctions.fingerprint($"text").as("fn"),
      TextFunctions.fingerprintDeclarative($"text").as("fd")).collect()
    edge.foreach(row => assert(row.getSeq[Long](0) === row.getSeq[Long](1)))
    assert(edge(0).getSeq[Long](0).isEmpty && edge(3).getSeq[Long](0).nonEmpty)
  }

  test("expressions registered in SQL via GraftExtensions") {
    // TestSpark session is built by GraftSession -> extensions active
    val r = spark.sql("SELECT graft_polyhash('abc') AS h, graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect().head
    assert(r.getLong(0) === ((97L * 31 + 98) * 31 + 99) % 1000000007L)
    assert(r.getDouble(1) === 1.0)
  }

  test("fixMojibake recombines any C2/C3 digraph, passes everything else through") {
    val cases = Seq(
      "cafÃ©" -> "café",          // Ã© → é
      "Â°C outside" -> "°C outside", // Â° → °
      "mixed Ã© and Â£" -> "mixed é and £", // é and £
      "plain ascii" -> "plain ascii",
      "trailing lone Ã" -> "trailing lone Ã", // no continuation → untouched
      "Ä© other lead" -> "Ä© other lead" // Ä not a mojibake lead
    )
    val out = cases.map(_._1).toDF("s")
      .select(NativeExpressions.fixMojibake($"s").as("f"))
      .collect().map(_.getString(0))
    assert(out.toSeq === cases.map(_._2))
    // null passes through
    assert(Seq[String](null).toDF("s")
      .select(NativeExpressions.fixMojibake($"s")).collect().head.isNullAt(0))
  }

  test("sketch aggregates callable from SQL via GraftExtensions") {
    Seq(5L, 1L, 9L, 3L, 7L).toDF("v").createOrReplaceTempView("sk_vals")
    val med = spark.sql(
      "SELECT graft_quantile_sketch(v, 0.5, 64) AS m FROM sk_vals").collect().head
    assert(med.getLong(0) === 5L)
    Seq("a", "b", "a", "c", "a", "b").toDF("t").createOrReplaceTempView("sk_toks")
    val hh = spark.sql(
      "SELECT graft_heavy_hitters(t, 2, 64) AS h FROM sk_toks").collect().head
    val entries = hh.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(entries === Seq(("a", 3L), ("b", 2L)))
  }

  test("whole-stage codegen keeps the expression inline (no UDF fallback)") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val df = docs.select(TextFunctions.polyHash($"text").as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan) // '*' = inside WholeStageCodegen
    assert(plan.contains("graft_polyhash"), plan)
    assert(plan.contains("ReadSchema: struct<text:string>"), plan) // pruned scan
    assert(df.count() > 0)
  }
}
