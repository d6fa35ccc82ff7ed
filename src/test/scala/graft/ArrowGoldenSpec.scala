package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file gate for the K4 Perspective wire format (VERDICT r9 #8):
  * the Arrow IPC stream served at `/table/{name}/arrow` is consumed by
  * browser clients byte-for-byte — a Spark/Arrow upgrade that silently
  * changes the layout (metadata version, padding, type mapping) would
  * break every deployed client while all row-level tests stay green.
  * The committed fixture pins the exact bytes; regenerate DELIBERATELY
  * with `GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.ArrowGoldenSpec"`
  * after auditing the diff.
  */
class ArrowGoldenSpec extends AnyFunSuite {

  private val goldenPath = Paths.get("src/test/resources/golden_view.arrow")

  /** Deterministic mini-view covering the type surface a Perspective
    * table actually serves: key, metric, label (with non-ASCII), flag,
    * event-time (µs UTC), and a nested numeric array — plus one row of
    * nulls in every nullable slot.
    */
  private def schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", DoubleType, nullable = true),
    StructField("label", StringType, nullable = true),
    StructField("flag", BooleanType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("vec", ArrayType(DoubleType, containsNull = false), nullable = true)))

  private def rows: Seq[Row] = Seq(
    Row(1L, 1.5, "alpha", true,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L, 123456000L)),
      Seq(1.0, 2.0, 3.0)),
    Row(2L, -0.25, "βγδ — unicode", false,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0L)),
      Seq(0.0)),
    Row(3L, null, null, null, null, null))

  test("K4 Arrow IPC stream bytes match the committed golden fixture") {
    val bytes = org.apache.spark.sql.graft.ArrowBridge.toArrowStream(rows, schema)
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      Files.createDirectories(goldenPath.getParent)
      Files.write(goldenPath, bytes)
      info(s"golden fixture regenerated (${bytes.length} bytes) — commit it")
    }
    assert(Files.exists(goldenPath),
      "golden fixture missing — regenerate with GRAFT_REGEN_GOLDEN=1 and commit")
    val golden = Files.readAllBytes(goldenPath)
    assert(bytes.length == golden.length,
      s"Arrow stream length drifted: ${bytes.length} vs golden ${golden.length}")
    assert(java.util.Arrays.equals(bytes, golden),
      "Arrow stream BYTES drifted from the committed golden fixture — " +
        "a Spark/Arrow upgrade changed the K4 wire format; audit browser impact, " +
        "then regenerate deliberately")
  }

  test("the golden fixture itself parses as a valid Arrow stream with the view schema") {
    // guards against committing a corrupt fixture: the byte gate above
    // would then pin garbage forever
    val golden =
      if (Files.exists(goldenPath)) Files.readAllBytes(goldenPath)
      else org.apache.spark.sql.graft.ArrowBridge.toArrowStream(rows, schema)
    val alloc = new org.apache.arrow.memory.RootAllocator(Long.MaxValue)
      .newChildAllocator("golden-read", 0, Long.MaxValue)
    val in = new java.io.ByteArrayInputStream(golden)
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(in, alloc)
    try {
      val arrowSchema = reader.getVectorSchemaRoot.getSchema
      assert(arrowSchema.getFields.size() === schema.size)
      assert(reader.loadNextBatch(), "stream carries one record batch")
      val root = reader.getVectorSchemaRoot
      assert(root.getRowCount === rows.size)
      val kVec = root.getVector("k").asInstanceOf[org.apache.arrow.vector.BigIntVector]
      assert((0 until root.getRowCount).map(kVec.get) === Seq(1L, 2L, 3L))
      val vVec = root.getVector("v").asInstanceOf[org.apache.arrow.vector.Float8Vector]
      assert(vVec.get(0) === 1.5 && vVec.isNull(2))
      assert(!reader.loadNextBatch(), "exactly one batch then EOS")
    } finally {
      reader.close()
      alloc.close()
    }
  }
}
