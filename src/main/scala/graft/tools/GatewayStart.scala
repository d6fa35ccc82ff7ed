package graft.tools

/** `csp-gateway-start` analogue: launch a configured gateway from a
  * JSON config file (see [[graft.server.GatewayConfig]] for the
  * document shape) and block until interrupted.
  *
  *   sbt "runMain graft.tools.GatewayStart /path/to/gateway.json"
  */
object GatewayStart {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: GatewayStart <config.json>")
    val spark = graft.core.GraftSession.build(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]", "graft-gateway",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    // the /controls/shutdown kill switch must take down the runtime,
    // session and PROCESS — stopping only the HTTP listeners would
    // leave a zombie JVM blocked on the join below
    lazy val loaded: graft.server.GatewayConfig.Loaded =
      graft.server.GatewayConfig.loadFile(spark, args(0), onShutdown = () => {
        loaded.runtime.stop(); spark.stop(); sys.exit(0)
      })
    loaded.runtime.start()
    val gw = loaded.gateway.start()
    println(s"graft gateway listening on port ${gw.boundPort}")
    sys.addShutdownHook {
      gw.stop(); loaded.runtime.stop(); spark.stop()
    }
    Thread.currentThread().join() // serve until killed
  }
}
