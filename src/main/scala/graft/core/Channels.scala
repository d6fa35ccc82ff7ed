package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

import scala.collection.mutable

/** Channel graph — the gateway's "streaming data catalog".
  *
  * A channel is a named, typed stream of rows
  * (reference: csp_gateway/server/gateway/csp/channels.py:182-194 —
  * there, a csp `ts[T]` edge on a Channels subclass). Here a channel is
  * a named `DataFrame` (batch) or streaming DataFrame bound into a
  * registry; dict-basket channels (reference: utils/csp.py:31-36) are a
  * single DataFrame with an extra key column, list channels are
  * `array<struct>` columns normalized via `explode`.
  *
  * Semantics reproduced from the reference:
  *  - modules `connect(channels)` and get/set channels by name; getting
  *    an unset channel yields a *delayed* edge resolved at finalize
  *    (channels.py:547-604);
  *  - multiple setters of the same channel are merged
  *    (`csp.flatten` ≙ `unionByName`, channels.py:439-472);
  *  - a module whose output feeds back into its own input would form a
  *    cycle; the reference auto-breaks these with one-cycle-delay
  *    feedbacks (channels.py:474-545). Spark DAGs cannot cycle — the
  *    registry detects the cycle at finalize and requires an explicit
  *    [[ChannelGraph.feedback]] declaration, which the streaming runtime
  *    implements as a `foreachBatch` re-injection (one micro-batch
  *    delay);
  *  - required channels without a provider raise
  *    [[NoProviderException]] (channels.py:331-437).
  */
final case class ChannelSpec(
    name: String,
    schema: StructType,
    /** dict-basket key column, if this channel is a keyed basket. */
    basketKey: Option[String] = None,
    /** declared basket key set (reference: enum/list-typed dict-basket
      * keys — routes 404 / ws messages void on keys outside it). None =
      * open key domain (str-typed basket).
      */
    basketKeys: Option[Seq[String]] = None,
    /** `s_`-state requested: keyby attribute names (may be dotted). */
    stateKeyby: Seq[String] = Nil,
    /** T7 lookup opt-out (reference base.py:72-78 `omit_from_lookup`:
      * the registry's "substantial memory overhead" escape hatch). */
    omitFromLookup: Boolean = false,
    /** Upper bound on retained lookup entries per channel, evicting
      * oldest-inserted first. The reference registry grows without
      * bound (documented OOM at sustained ingest); a bound is the
      * 100×-ingest-safe default.
      */
    lookupMaxEntries: Int = 1 << 20,
    /** required=false channels resolve to an empty frame when unset. */
    required: Boolean = true,
    /** Per-record ingest hook (reference KafkaChannelProcessor.process,
      * modules/kafka/utils.py:13-58): runs after coercion, may rewrite
      * the row; None drops the record silently. Applied on map-based
      * ingest (`send` — REST/WS/Kafka parse paths); engine-log replay
      * re-emits rows verbatim, like the reference's replay.
      */
    processor: Option[Row => Option[Row]] = None,
    /** Model-level post-validator (reference base.py:99-114
      * `_validate_gateway_struct_after`): runs after the processor;
      * Left(reason) rejects the whole send with
      * IllegalArgumentException (the gateway maps it to 422).
      */
    validateAfter: Option[Row => Either[String, Row]] = None
)

class NoProviderException(channel: String)
    extends RuntimeException(s"No provider for required channel '$channel'")

class CycleException(path: Seq[String])
    extends RuntimeException(
      s"Channel cycle ${path.mkString(" -> ")}; declare feedback(...) to break it")

/** Include/exclude channel-name selection with declaration ordering —
  * reference: csp_gateway/server/shared/channel_selection.py:13-111.
  */
final case class ChannelSelection(
    include: Option[Seq[String]] = None,
    exclude: Seq[String] = Nil
) {
  def select(all: Seq[String]): Seq[String] = {
    val base = include match {
      case Some(inc) => inc.distinct.filter(all.contains) // reference dedups (dict keys)
      case None      => all
    }
    base.filterNot(exclude.contains)
  }
}

trait Module {
  def connect(g: ChannelGraph): Unit
}

/** Per-channel module wiring, as recorded during [[ChannelGraph.attach]]
  * — reference `_modules_connections_graph` (channels.py:228,288-309):
  * which modules push to (`setters`) and pull from (`getters`) each
  * channel. Serialized by the gateway's `/channels_graph` route.
  */
final case class ChannelConnections(getters: Seq[String], setters: Seq[String])

/** Build-phase wiring of channels. Two phases like the reference
  * (`ChannelsFactory.build`, channels.py:241-278): modules declare edges
  * (`set`, `transform`), then [[finalizeGraph]] resolves delayed gets,
  * merges multi-providers, validates cycles and providers.
  */
final class ChannelGraph(val specs: Map[String, ChannelSpec]) {

  private val providers =
    mutable.LinkedHashMap.empty[String, mutable.Buffer[() => DataFrame]]
  /** transform edges: (inputs, output, fn) — fn sees resolved inputs. */
  private val transforms =
    mutable.Buffer.empty[(Seq[String], String, Seq[DataFrame] => DataFrame)]
  private val feedbacks = mutable.Set.empty[String]
  private val resolved = mutable.LinkedHashMap.empty[String, DataFrame]

  // module-attribution of edges (reference channels.py:279-309: the
  // channels object knows which module is currently connecting and
  // records every get/set under its name)
  private var currentModule: Option[String] = None
  private val connections =
    mutable.LinkedHashMap.empty[String, (mutable.Buffer[String], mutable.Buffer[String])]
  private var finalized = false

  private def record(name: String, setting: Boolean): Unit =
    currentModule.foreach { m =>
      val (getters, setters) = connections.getOrElseUpdate(
        name, (mutable.Buffer.empty[String], mutable.Buffer.empty[String]))
      val bucket = if (setting) setters else getters
      if (!bucket.contains(m)) bucket += m
    }

  /** Connect a module under its name, so every `set`/`transform` edge it
    * declares is attributed to it in [[connectionsGraph]] (reference
    * `_module_being_attached`, channels.py:280-286).
    */
  def attach(module: Module): Unit = {
    // normalize Scala synthetic class-name decorations: `Foo$` for
    // top-level objects, `Foo$1$` for method-local ones
    currentModule = Some(
      module.getClass.getSimpleName.stripSuffix("$").replaceAll("\\$\\d+$", ""))
    try module.connect(this)
    finally currentModule = None
  }

  /** Channel → modules wiring (reference channels.py:976-979 `graph()`:
    * only valid once finalized — wiring may still grow before that).
    */
  def connectionsGraph: Map[String, ChannelConnections] = {
    require(finalized, "Must finalize graph first")
    connections.map { case (ch, (g, s)) =>
      ch -> ChannelConnections(g.toSeq, s.toSeq)
    }.toMap
  }

  def spec(name: String): ChannelSpec =
    specs.getOrElse(name, throw new NoSuchElementException(s"Unknown channel '$name'"))

  /** Provide rows for a channel (a source module). */
  def set(name: String)(df: => DataFrame): Unit = {
    spec(name)
    record(name, setting = true)
    providers.getOrElseUpdate(name, mutable.Buffer.empty) += (() => df)
  }

  /** Declare a derived channel: output = fn(inputs). */
  def transform(inputs: Seq[String], output: String)(
      fn: Seq[DataFrame] => DataFrame): Unit = {
    (inputs :+ output).foreach(spec)
    inputs.foreach(record(_, setting = false))
    record(output, setting = true)
    transforms += ((inputs, output, fn))
  }

  /** Explicitly allow a cycle through this channel (one-batch delay in
    * the streaming runtime — reference channels.py:474-545 feedback). */
  def feedback(name: String): Unit = { spec(name); feedbacks += name }

  /** Resolve the graph: topo-evaluate transforms, merge providers with
    * `unionByName(allowMissingColumns)` (≙ csp.flatten), detect cycles.
    */
  def finalizeGraph(): Map[String, DataFrame] = {
    // edges: output depends on inputs (minus declared feedbacks)
    val deps: Map[String, Seq[String]] = transforms
      .groupBy(_._2)
      .map { case (out, ts) =>
        out -> ts.flatMap(_._1).distinct.filterNot(feedbacks.contains).toSeq
      }
      .toMap
    // cycle detection: DFS over transform dependency edges
    val visiting = mutable.Set.empty[String]
    val done = mutable.Set.empty[String]
    def visit(n: String, path: List[String]): Unit = {
      if (visiting.contains(n)) throw new CycleException((n :: path).reverse)
      if (!done.contains(n)) {
        visiting += n
        deps.getOrElse(n, Nil).foreach(visit(_, n :: path))
        visiting -= n
        done += n
      }
    }
    deps.keys.foreach(visit(_, Nil))

    def empty(name: String): DataFrame =
      org.apache.spark.sql.SparkSession.active.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), spec(name).schema)

    def resolve(name: String): DataFrame = resolved.getOrElseUpdate(
      name, {
        val fromProviders = providers.getOrElse(name, Nil).map(_.apply()).toSeq
        val fromTransforms = transforms.filter(_._2 == name).map {
          // A declared feedback input resolves to an empty frame at
          // build time (csp feedback = initially-empty delayed edge;
          // the streaming runtime does the actual one-batch loop-back).
          case (ins, _, fn) =>
            fn(ins.map(i => if (feedbacks.contains(i)) empty(i) else resolve(i)))
        }.toSeq
        val all = fromProviders ++ fromTransforms
        if (all.isEmpty) {
          if (spec(name).required) throw new NoProviderException(name)
          else empty(name) // null_ts analogue (channels.py:418-421)
        } else all.reduce(_.unionByName(_, allowMissingColumns = true))
      }
    )
    val out = specs.keys.flatMap { n =>
      val hasAny = providers.contains(n) || transforms.exists(_._2 == n)
      if (hasAny || specs(n).required) Some(n -> resolve(n)) else None
    }.toMap
    finalized = true
    out
  }
}
