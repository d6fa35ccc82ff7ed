package graft.testing

import scala.collection.mutable

import org.apache.spark.sql.Row

import graft.streaming.ChannelRuntime

/** Declarative gateway test harness — the analogue of the reference's
  * `GatewayTestHarness` event DSL (testing/harness.py:31-120): build a
  * timeline of send / delay / assert / exec events, then `run()` it
  * against a live [[ChannelRuntime]]. Each `delay()` is one engine
  * cycle (process all in-flight micro-batches), mirroring the
  * reference's in-graph time steps.
  *
  * {{{
  * new GatewayTestHarness(rt)
  *   .send("example", Map("x" -> 1L))
  *   .delay()
  *   .assertTicked("example", 1)
  *   .assertLast("example")(r => r.getAs[Long]("x") == 1L)
  *   .exec(() => otherCheck())
  *   .run()
  * }}}
  */
final class GatewayTestHarness(runtime: ChannelRuntime) {

  private sealed trait Event
  private case class SendEv(channel: String, values: Seq[Map[String, Any]]) extends Event
  private case object DelayEv extends Event
  private case class AssertTickedEv(channel: String, expected: Long) extends Event
  private case class AssertLastEv(channel: String, pred: Row => Boolean, desc: String) extends Event
  private case class AssertStateEv(channel: String, pred: Seq[Row] => Boolean, desc: String) extends Event
  private case class ExecEv(f: () => Unit) extends Event

  private val timeline = mutable.Buffer.empty[Event]

  /** Queue a tick (single or multiple rows) into a channel. */
  def send(channel: String, values: Map[String, Any]*): this.type = {
    timeline += SendEv(channel, values.toSeq); this
  }

  /** One engine cycle: drain all in-flight micro-batches. */
  def delay(): this.type = { timeline += DelayEv; this }

  /** Assert the channel's total tick count so far. */
  def assertTicked(channel: String, expected: Long): this.type = {
    timeline += AssertTickedEv(channel, expected); this
  }

  /** Assert a predicate on the channel's last tick. */
  def assertLast(channel: String, desc: String = "last-tick predicate")(
      pred: Row => Boolean): this.type = {
    timeline += AssertLastEv(channel, pred, desc); this
  }

  /** Assert a predicate on the channel's accumulated state rows. */
  def assertState(channel: String, desc: String = "state predicate")(
      pred: Seq[Row] => Boolean): this.type = {
    timeline += AssertStateEv(channel, pred, desc); this
  }

  /** Arbitrary check/side effect at this point of the timeline. */
  def exec(f: () => Unit): this.type = { timeline += ExecEv(f); this }

  /** Execute the timeline; throws AssertionError with the failing
    * step's description (reference: np.testing assertions inside the
    * graph).
    */
  def run(): Unit = timeline.zipWithIndex.foreach {
    case (SendEv(ch, vs), _) => runtime.send(ch, vs)
    case (DelayEv, _) => runtime.processAllAvailable()
    case (AssertTickedEv(ch, want), i) =>
      val got = runtime.tickCount(ch)
      if (got != want)
        throw new AssertionError(s"step $i: channel '$ch' ticked $got times, expected $want")
    case (AssertLastEv(ch, pred, desc), i) =>
      val last = runtime.last(ch)
      if (!last.exists(pred))
        throw new AssertionError(s"step $i: $desc failed on '$ch' last=$last")
    case (AssertStateEv(ch, pred, desc), i) =>
      val rows = runtime.state(ch)
      if (!pred(rows))
        throw new AssertionError(s"step $i: $desc failed on '$ch' state (${rows.length} rows)")
    case (ExecEv(f), _) => f()
  }
}
