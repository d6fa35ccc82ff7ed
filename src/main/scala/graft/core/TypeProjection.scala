package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-compatible type projections (SURVEY.md §1.3).
  *
  * The reference degrades several types when projecting rows into its
  * DuckDB state tables (state.py:502-587): enums → their `.name`
  * string, timedelta → string, list/set/ndarray → stringified,
  * dict → stringified, unsupported → dropped with a warning. Spark can
  * represent all of these natively (ArrayType/MapType/Interval), which
  * is the better engine choice — so the native schema is the default
  * and `strictCompat` opts into the reference's exact degradation
  * rules for hash-equal interop with reference outputs (SURVEY.md
  * §7.5.6).
  */
object TypeProjection {

  /** Spark-native projection: keeps arrays/maps/structs typed
    * (improvement over the reference, noted per type in §1.3).
    */
  def native(df: DataFrame): DataFrame = df

  /** strictCompat: apply the reference's DuckDB-projection
    * degradations column-by-column.
    */
  def strictCompat(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.flatMap { f => project(f.name, f.dataType) }
    df.select(cols.toSeq: _*)
  }

  private def project(name: String, dt: DataType): Option[Column] = dt match {
    // native scalars pass through (state.py:563-565, 553-558)
    case _: NumericType | StringType | BooleanType | TimestampType | DateType =>
      Some(col(name))
    // timedelta is "unsupported in DuckDB" -> string (state.py:559-561)
    case _: DayTimeIntervalType | _: YearMonthIntervalType =>
      Some(col(name).cast(StringType).as(name))
    // nested structs recurse (state.py:519-521, 571-587)
    case s: StructType =>
      val inner = s.fields.flatMap(f => project(s"$name.${f.name}", f.dataType)
        .map(_.as(f.name)))
      if (inner.isEmpty) None else Some(struct(inner.toSeq: _*).as(name))
    // lists/sets/ndarrays stringified (state.py:526-536)
    case _: ArrayType => Some(to_json(col(name)).as(name))
    // dicts stringified (state.py:537-549)
    case _: MapType => Some(to_json(col(name)).as(name))
    // unsupported -> dropped with warning (state.py:579-586)
    case _ => None
  }

  /** Enum columns are carried as their `.name` strings end-to-end in
    * graft schemas (state.py:550-551 projection is identity here);
    * this helper maps an ordinal-coded column through a value list the
    * way a reference enum serializes.
    */
  def enumName(ordinal: Column, names: Seq[String]): Column = {
    val arr = array(names.map(lit): _*)
    element_at(arr, ordinal.cast("int") + 1)
  }
}
