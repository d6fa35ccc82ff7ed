package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.state._

/** Exhaustive tests for the Query/Filter → Column translator:
  * types × operators × dotted paths (reference filter.py semantics).
  */
class QueryTranslatorSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("i", LongType),
    StructField("d", DoubleType),
    StructField("s", StringType),
    StructField("t", TimestampType),
    StructField("nest", StructType(Seq(StructField("inner", IntegerType))))))

  private val attrs = Seq("i", "d", "s", "nest.inner")
  private val bys = Seq[FilterBy](
    FilterBy.Value(1), FilterBy.Value(1.5), FilterBy.Value("x"),
    FilterBy.When(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")),
    FilterBy.Attr("i"), FilterBy.Attr("nest.inner"))

  test("every known attr × op × by-kind translates to a defined Column") {
    for (attr <- attrs; op <- QueryTranslator.Ops; by <- bys) {
      val f = StateFilter(attr, by, op)
      assert(QueryTranslator.toColumn(schema, f).isDefined, s"$attr $op $by")
    }
  }

  test("unknown attrs are always dropped (never throw)") {
    for (attr <- Seq("ghost", "nest.ghost", "s.x", ""); op <- QueryTranslator.Ops) {
      val f = StateFilter(attr, FilterBy.Value(1), op)
      assert(QueryTranslator.toColumn(schema, f).isEmpty, s"$attr $op")
    }
  }

  test("filter against an unknown rhs attr is dropped") {
    val f = StateFilter("i", FilterBy.Attr("ghost"), "<")
    assert(QueryTranslator.toColumn(schema, f).isEmpty)
  }

  test("dotted path resolution") {
    assert(QueryTranslator.resolveType(schema, "nest.inner").contains(IntegerType))
    assert(QueryTranslator.resolveType(schema, "nest.ghost").isEmpty)
    assert(QueryTranslator.resolveType(schema, "s.x").isEmpty)
  }

  test("unsupported operator throws") {
    intercept[IllegalArgumentException] {
      QueryTranslator.toColumn(schema, StateFilter("i", FilterBy.Value(1), "~="))
    }
  }

  test("all filters dropped => no predicate; survivors conjoin") {
    val dropped = StateQuery(Seq(StateFilter("ghost", FilterBy.Value(1), "==")))
    assert(QueryTranslator.toColumn(schema, dropped).isEmpty)
    val mixed = StateQuery(Seq(
      StateFilter("ghost", FilterBy.Value(1), "=="),
      StateFilter("i", FilterBy.Value(1), "<")))
    assert(QueryTranslator.toColumn(schema, mixed).isDefined)
  }
}
