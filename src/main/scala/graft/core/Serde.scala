package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{from_json, to_json}
import org.apache.spark.sql.types.StructType

/** Payload serde injection point (reference kafka.py:129-143,220-269
  * `serialize_to_python` / `deserialize_to_*` overrides): how a
  * channel's typed struct maps to/from the wire `value`. COLUMN-level
  * (an expression rewrite, not a Row lambda) so custom serdes stay
  * inside WholeStageCodegen and the sink/source plan shape is
  * unchanged by injection.
  */
trait PayloadSerde {
  /** Raw wire value (binary/string column) → typed struct of `schema`. */
  def decode(value: Column, schema: StructType): Column
  /** Typed struct column → wire value. */
  def encode(payload: Column): Column
}

/** Default JSON wire format (the reference's json_converter). */
object JsonSerde extends PayloadSerde {
  override def decode(value: Column, schema: StructType): Column =
    from_json(value.cast("string"), schema)
  override def encode(payload: Column): Column = to_json(payload)
}
