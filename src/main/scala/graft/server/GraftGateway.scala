package graft.server

import org.apache.spark.sql.SparkSession

import graft.core.ChannelSpec
import graft.streaming.ChannelRuntime

/** A pluggable gateway module — the analogue of the reference's
  * `GatewayModule` (SURVEY.md §3.2): contributes channels at build
  * time (`dynamic_channels`, gateway.py:105-138) and wires behavior
  * (feedbacks, listeners, initial sends) once the runtime exists.
  */
trait GatewayModule {
  /** Channels this module contributes (merged with the static set;
    * duplicate names must agree on the spec). */
  def dynamicChannels: Map[String, ChannelSpec] = Map.empty

  /** Wire feedbacks/listeners/initial data. Called before queries
    * start (the reference's `connect(channels)` phase). */
  def connect(runtime: ChannelRuntime): Unit = {}
}

/** Build + execute lifecycle of the whole gateway (reference
  * `Gateway(modules, channels).start(rest=True)`, gateway.py:202-275):
  * assemble static + module-contributed channel specs, create the
  * streaming runtime, run each module's connect, start the per-channel
  * queries, then mount the REST/SSE surface.
  */
final class GraftGateway(
    spark: SparkSession,
    staticChannels: Map[String, ChannelSpec],
    modules: Seq[GatewayModule] = Nil,
    port: Int = 0,
    authFilterFields: Map[String, String] = Map.empty) {

  val specs: Map[String, ChannelSpec] = {
    val dyn = modules.flatMap(_.dynamicChannels.toSeq)
    val all = staticChannels.toSeq ++ dyn
    all.groupBy(_._1).foreach { case (name, defs) =>
      val distinct = defs.map(_._2).distinct
      require(distinct.size == 1,
        s"Conflicting specs for channel '$name' across modules")
    }
    all.toMap
  }

  val runtime = new ChannelRuntime(spark, specs)
  private var rest: Gateway = _

  def start(): GraftGateway = {
    modules.foreach(_.connect(runtime)) // build phase: wire edges
    runtime.start()                     // execution phase
    rest = new Gateway(runtime, port, authFilterFields).start() // web phase
    this
  }

  def boundPort: Int = rest.boundPort

  def stop(): Unit = {
    if (rest != null) rest.stop()
    runtime.stop()
  }
}
