package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** In-memory topic transport carrying the exact Kafka record contract
  * the broker-gated wiring targets: (topic, key, value, broker
  * timestamp). The build environment has no broker, so this is the
  * e2e seam for S1/K1 — [[graft.sinks.Sinks.toKafkaValue]] publishes
  * INTO it and [[Sources.kafkaSubscribe]] reads OUT of it, running the
  * full serde + envelope + pre-start gate + out-of-order clamp path
  * (reference kafka.py:259-353) against real frames; against a real
  * cluster only the transport swaps (`format("kafka")`), never the
  * transforms.
  *
  * Topic/key routing mirrors the reference's
  * `publish_channel_to_topic_and_key` / `subscribe_channel_to_topic_
  * and_key` maps (kafka.py:298-343): a channel publishes to (topic,
  * key) pairs; a subscriber takes one topic, optionally filtered to
  * one key.
  */
final class TopicBus {
  import TopicBus.Record

  private val log = new ConcurrentLinkedQueue[Record]

  def publish(topic: String, key: String, value: String,
      timestamp: java.sql.Timestamp): Unit =
    log.add(Record(topic, key, value, timestamp))

  /** Publish a wire frame produced by `Sinks.toKafkaValue` —
    * (value[, key]) columns — stamping each record with the broker
    * receive time (what `timestamp` means on a real broker).
    */
  def publishFrame(wire: DataFrame, topic: String,
      timestamp: java.sql.Timestamp): Unit = {
    val hasKey = wire.columns.contains("key")
    wire.collect().foreach { r =>
      publish(topic,
        if (hasKey) r.getAs[String]("key") else null,
        r.getAs[String]("value"), timestamp)
    }
  }

  def records(topic: String): Seq[Record] =
    log.asScala.filter(_.topic == topic).toSeq

  /** The subscribe surface: a kafka-shaped batch frame (key, value,
    * timestamp) for one topic, optionally key-filtered — feed it to
    * [[Sources.kafkaSubscribe]] exactly like a broker stream.
    */
  def toDataFrame(spark: SparkSession, topic: String,
      key: Option[String] = None): DataFrame = {
    val rows: java.util.List[Row] = records(topic)
      .map(r => Row(r.key, r.value, r.timestamp): Row).asJava
    val df = spark.createDataFrame(rows, TopicBus.frameSchema)
    key.map(k => df.filter(col("key") === k)).getOrElse(df)
  }
}

object TopicBus {
  final case class Record(topic: String, key: String, value: String,
      timestamp: java.sql.Timestamp)

  /** The kafka source's projected shape (key, value, timestamp). */
  val frameSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("timestamp", TimestampType)))
}
