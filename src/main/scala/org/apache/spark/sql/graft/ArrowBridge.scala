package org.apache.spark.sql.graft

import java.io.ByteArrayOutputStream

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.ArrowUtils

/** Rows → Arrow IPC STREAM bytes (schema header + one record batch +
  * EOS), the wire format a Perspective browser client ingests directly
  * (`perspective.Table(arrow)`; reference perspective.py:71-100 ships
  * exactly this from pyarrow). Lives in the spark.sql namespace to
  * reach Spark's own Arrow writer + type mapping — the same code path
  * `Dataset.toArrow` uses, so every Spark type serializes with Spark's
  * canonical Arrow layout (timestamps as µs UTC, decimals, nested
  * arrays/structs) rather than a hand-rolled subset.
  */
object ArrowBridge {

  def toArrowStream(rows: Seq[Row], schema: StructType,
      timeZoneId: String = "UTC"): Array[Byte] = {
    val arrowSchema = ArrowUtils.toArrowSchema(schema, timeZoneId,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graft-arrow-view", 0, Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    try {
      val writer = ArrowWriter.create(root)
      val toInternal = ExpressionEncoder(RowEncoder.encoderFor(schema))
        .createSerializer()
      rows.foreach(r => writer.write(toInternal(r)))
      writer.finish()
      val out = new ByteArrayOutputStream()
      val sw = new ArrowStreamWriter(root, null, out)
      sw.start()
      sw.writeBatch()
      sw.end()
      sw.close()
      out.toByteArray
    } finally {
      root.close()
      allocator.close()
    }
  }
}
