package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ChannelSpec
import graft.server.{GatewayModule, GraftGateway}
import graft.streaming.ChannelRuntime

/** Full gateway lifecycle: module-contributed dynamic channels +
  * module wiring + REST surface, end to end (reference §3.2).
  */
class GraftGatewaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val http = HttpClient.newHttpClient()

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("timestamp", TimestampType),
    StructField("x", LongType)))

  private object EchoModule extends GatewayModule {
    override def dynamicChannels = Map(
      "echo_out" -> ChannelSpec("echo_out", schema, stateKeyby = Seq("x")))
    override def connect(rt: ChannelRuntime): Unit =
      rt.addFeedback("inbox", "echo_out")(r => Some(r))
  }

  test("modules contribute channels and wiring; REST serves them") {
    val gw = new GraftGateway(spark,
      Map("inbox" -> ChannelSpec("inbox", schema)), Seq(EchoModule))
    assert(gw.specs.keySet === Set("inbox", "echo_out"))
    gw.start()
    try {
      val post = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${gw.boundPort}/api/v1/send/inbox"))
        .POST(HttpRequest.BodyPublishers.ofString("""{"x": 5}""")).build()
      assert(http.send(post, HttpResponse.BodyHandlers.ofString()).statusCode() === 200)
      gw.runtime.processAllAvailable() // inbox batch -> feedback enqueue
      gw.runtime.processAllAvailable() // echo_out batch
      val get = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${gw.boundPort}/api/v1/last/echo_out")).build()
      val body = http.send(get, HttpResponse.BodyHandlers.ofString()).body()
      assert(body.contains("\"x\":5"), body)
    } finally gw.stop()
  }

  test("conflicting module channel specs are rejected at build") {
    object Bad extends GatewayModule {
      override def dynamicChannels = Map("inbox" -> ChannelSpec("inbox",
        StructType(Seq(StructField("other", StringType)))))
    }
    intercept[IllegalArgumentException] {
      new GraftGateway(spark, Map("inbox" -> ChannelSpec("inbox", schema)), Seq(Bad))
    }
  }
}
