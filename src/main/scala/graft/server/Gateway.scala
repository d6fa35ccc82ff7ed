package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.concurrent.duration._
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.state.QueryTranslator
import graft.streaming.{ChannelRuntime, EngineLog}

/** REST query surface over a running [[ChannelRuntime]] — the
  * reference's FastAPI routes re-expressed on the JDK http server
  * (zero-dependency; SURVEY.md §3.1/§3.3 response semantics):
  *
  *   GET  /api/v1/last/{channel}            → [row] | []
  *   GET  /api/v1/next/{channel}            → [row] (blocks for next tick)
  *   GET  /api/v1/state/{channel}?query=…   → [rows] (filters + NULLS FIRST order)
  *   POST /api/v1/send/{channel}            → echo of validated rows
  *   GET  /api/v1/lookup/{channel}/{id}     → row | 404
  *
  * Status mapping mirrors the reference routes: unknown channel → 404,
  * validation failure on send → 422, state-query execution errors are
  * swallowed to `[]` (reference state.py:614-622). Optional per-identity
  * row filtering (X13, auth_filter.py): a configured field must equal
  * the identity's value on every row served or accepted.
  */
final class Gateway(
    runtime: ChannelRuntime,
    port: Int = 0,
    /** X13: channel -> field that must equal the caller identity
      * (header `x-identity`) on reads and writes. */
    authFilterFields: Map[String, String] = Map.empty,
    /** Invoked (background thread) after POST /controls/shutdown stops
      * the listeners — the launcher's chance to stop the runtime,
      * session, and process (reference gateway.stop does all three). */
    onShutdown: () => Unit = () => (),
    /** API-key authentication (reference MountAPIKeyMiddleware,
      * middleware/api_key.py:22-61): when non-empty, every request
      * must present one of these keys as a `token` query parameter,
      * `token` header, or `token` cookie — 403 "unauthorized"
      * otherwise. Empty = auth disabled (middleware not mounted). */
    apiKeys: Seq[String] = Nil,
    /** Simple username/password authentication (reference
      * MountSimpleAuthMiddleware, middleware/simple.py:135-459):
      * when non-empty, HTTP Basic credentials or a prior session
      * cookie authorize a request, `/login` (Basic or form POST)
      * issues an HttpOnly session cookie (UUID → identity, the
      * reference's `identity_store`), `/logout` revokes it. The
      * credential map is the offline analog of the reference's
      * external-validator hook (its PAM/Windows host validation is
      * host-specific); the authenticated username IS the X13
      * identity, so `authFilterFields` row filtering composes with
      * it exactly like the reference's IdentityAwareMiddlewareMixin.
      * Both middlewares may be mounted at once — any one passing
      * authorizes (reference multi-auth ordering). */
    simpleAuthUsers: Map[String, String] = Map.empty,
    /** Session lifetime for [[simpleAuthUsers]] cookies. */
    sessionTimeoutMillis: Long = 12L * 3600 * 1000,
    /** Session cookie name (reference default "session"). */
    sessionCookieName: String = "session",
    /** OAuth2/OIDC middleware (reference MountOAuth2Middleware,
      * middleware/oauth.py:23-358): authorization-code login at
      * /login → issuer, callback at /auth/callback mints the session
      * cookie, bearer tokens validate per-request; the userinfo
      * identity feeds X13 row filtering. Co-mountable with the other
      * middlewares — any one passing authorizes. */
    oauth: Option[OAuthConfig] = None,
    /** External API-key validator hook (reference
      * MountExternalAPIKeyMiddleware, api_key_external.py:23-180): a
      * presented `token` credential is handed to this function;
      * Some(identity) authorizes the request AND becomes its X13
      * identity. None (default) = plain [[apiKeys]] membership, the
      * offline credential-map analog. */
    apiKeyValidator: Option[String => Option[String]] = None,
    /** Static-field REST routes (reference MountFieldRestRoutes,
      * modules/web/mount_fields.py:10-82): non-ts values served at
      * GET /api/v1/field/{name} (listing at /field), JSON-serialized.
      * Unknown name → 404, like the reference's route. */
    staticFields: Map[String, Any] = Map.empty) {

  private val mapper = new ObjectMapper()
  // TCP_NODELAY on the JDK server: without it, small keep-alive
  // responses interleave with the peer's 40 ms delayed ACK and every
  // interactive read floors at ~44 ms (ClientSoak-measured); the
  // property is read at ServerConfig class load, so set it before the
  // first HttpServer instantiates
  Gateway.enableNoDelay()
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  // cached (elastic) pool: /stream holds a thread per subscriber and
  // /next blocks up to 30s — a fixed pool would let a handful of
  // long-lived subscribers starve ingest entirely
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())

  def boundPort: Int = server.getAddress.getPort

  /** S6 — companion WebSocket endpoint (RFC 6455 needs a raw socket;
    * the JDK http server cannot upgrade connections, so it binds its
    * own port). Same runtime, same identity filtering.
    */
  private val ws = new WebSocketServer(runtime, authFilterFields,
    identityFromHeaders = wsIdentity)
  def wsPort: Int = ws.boundPort

  private val oauthSupport: Option[OAuthSupport] = oauth.map(new OAuthSupport(_))

  /** Auth identity for a WebSocket handshake, from its (lowercased)
    * headers: simple-auth session cookie, then Basic, then the OAuth
    * session cookie / bearer (same ordering as the REST side). */
  private def wsIdentity(headers: Map[String, String]): Option[String] = {
    def cookieVal(name: String): Option[String] = headers.get("cookie")
      .flatMap(_.split(";").map(_.trim).collectFirst {
        case kv if kv.startsWith(name + "=") => kv.stripPrefix(name + "=")
      })
    val simple =
      if (simpleAuthUsers.isEmpty) None
      else cookieVal(sessionCookieName).flatMap(sessionUserByUuid)
        .orElse(headers.get("authorization").flatMap(basicUserOf))
    simple.orElse(oauthSupport.flatMap(o =>
      o.identityFrom(cookieVal(o.cookieName), headers.get("authorization"))))
  }

  /** All `token` credentials on a request: query param, header, or
    * cookie (reference api_key.py:46-59 extraction order). */
  private def presentedTokens(ex: HttpExchange): Seq[String] = {
    val fromQuery = Option(ex.getRequestURI.getRawQuery)
      .flatMap(_.split("&").collectFirst {
        case kv if kv.startsWith("token=") =>
          java.net.URLDecoder.decode(kv.stripPrefix("token="), "UTF-8")
      })
    val fromHeader = Option(ex.getRequestHeaders.getFirst("token"))
    val fromCookie = cookie(ex, "token")
    Seq(fromQuery, fromHeader, fromCookie).flatten
  }

  /** API-key check (reference api_key.py): any configured key. */
  private def apiKeyAuthorized(ex: HttpExchange): Boolean =
    apiKeys.nonEmpty && presentedTokens(ex).exists(apiKeys.contains)

  /** External-validator identity: first presented token the hook
    * accepts (api_key_external.py get_identity_from_credentials). */
  private def apiKeyIdentity(ex: HttpExchange): Option[String] =
    apiKeyValidator.flatMap { v =>
      presentedTokens(ex).iterator.map(v).collectFirst { case Some(id) => id }
    }

  /** OAuth identity: session cookie, else validated bearer. */
  private def oauthIdentity(ex: HttpExchange): Option[String] =
    oauthSupport.flatMap(o => o.identityFrom(
      cookie(ex, o.cookieName),
      Option(ex.getRequestHeaders.getFirst("Authorization"))))

  // ---- Simple Auth (reference middleware/simple.py) ----------------------

  /** `identity_store`: session UUID → (username, expiry). Expired
    * entries are purged lazily on every lookup. */
  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  private def cookie(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestHeaders.getFirst("Cookie"))
      .flatMap(_.split(";").map(_.trim).collectFirst {
        case kv if kv.startsWith(name + "=") => kv.stripPrefix(name + "=")
      })

  /** Live (unexpired) session's user for a session UUID, if any. */
  private def sessionUserByUuid(uuid: String): Option[String] =
    Option(sessions.get(uuid)).flatMap { case (user, expires) =>
      if (System.currentTimeMillis() <= expires) Some(user)
      else { sessions.remove(uuid); None }
    }

  /** Username for a live session cookie, if any. */
  private def sessionUser(ex: HttpExchange): Option[String] =
    cookie(ex, sessionCookieName).flatMap(sessionUserByUuid)

  /** Username for a valid `Authorization: Basic …` header value. */
  private def basicUserOf(header: String): Option[String] =
    Option(header).filter(_.startsWith("Basic ")).flatMap { h =>
      try {
        val decoded = new String(
          java.util.Base64.getDecoder.decode(h.stripPrefix("Basic ").trim),
          StandardCharsets.UTF_8)
        decoded.split(":", 2) match {
          // constant-time compare: a naive String.equals leaks the
          // matching prefix length through response timing
          case Array(u, p) if simpleAuthUsers.get(u).exists(expect =>
            java.security.MessageDigest.isEqual(
              expect.getBytes(StandardCharsets.UTF_8),
              p.getBytes(StandardCharsets.UTF_8))) => Some(u)
          case _ => None
        }
      } catch { case NonFatal(_) => None }
    }

  /** Username for valid HTTP Basic credentials, if presented. */
  private def basicUser(ex: HttpExchange): Option[String] =
    Option(ex.getRequestHeaders.getFirst("Authorization")).flatMap(basicUserOf)

  /** Simple-auth identity (session cookie first, then Basic —
    * reference get_identity_from_credentials ordering). */
  private def simpleAuthUser(ex: HttpExchange): Option[String] =
    if (simpleAuthUsers.isEmpty) None
    else sessionUser(ex).orElse(basicUser(ex))

  private def createSession(user: String): String = {
    // sweep expired entries here: lazy lookup-purge alone never frees
    // sessions whose uuid is simply abandoned, a slow leak on a
    // long-lived gateway; one O(live sessions) pass per login is cheap
    val now = System.currentTimeMillis()
    sessions.entrySet().removeIf(e => e.getValue._2 < now)
    val uuid = java.util.UUID.randomUUID().toString
    sessions.put(uuid, (user, now + sessionTimeoutMillis))
    uuid
  }

  private def authDisabled: Boolean =
    apiKeys.isEmpty && simpleAuthUsers.isEmpty &&
      oauthSupport.isEmpty && apiKeyValidator.isEmpty

  /** Resolve the request's authenticated identity ONCE per exchange
    * and cache it on the exchange: the OAuth bearer path and the
    * external key validator are network round trips, and both the
    * auth gate and the X13 row filter need the answer — without the
    * cache every authenticated request paid the external validation
    * twice (ADVICE r8). Resolution order matches the X13 filter's
    * (simple auth, then OAuth, then external validator). */
  // NOT HttpExchange.setAttribute — that map belongs to the
  // HttpContext and is shared across ALL exchanges, which would leak
  // one request's identity into the next. The gate and the handler
  // run on the same dispatch thread for one exchange, so a
  // ThreadLocal keyed by the exchange reference is a safe cache.
  private val identityCache =
    new ThreadLocal[(HttpExchange, Option[String])]

  private def resolvedIdentity(ex: HttpExchange): Option[String] =
    identityCache.get() match {
      case (cachedEx, id) if cachedEx eq ex => id
      case _ =>
        val id = simpleAuthUser(ex).orElse(oauthIdentity(ex))
          .orElse(apiKeyIdentity(ex))
        identityCache.set((ex, id))
        id
    }

  private def authorized(ex: HttpExchange): Boolean =
    authDisabled || apiKeyAuthorized(ex) || resolvedIdentity(ex).nonEmpty

  /** Wrap a context handler with the auth gate. 403 is the API-key
    * middleware's rejection (api_key.py); session-based mounts
    * (simple auth, OAuth) reject with 401 + the matching challenge
    * (simple.py's / oauth.py's auth_error_handler), like the
    * reference. Co-mounted middlewares: any one passing authorizes.
    */
  private def gated(h: HttpExchange => Unit): HttpExchange => Unit =
    ex =>
      if (authorized(ex)) h(ex)
      else if (apiKeys.isEmpty && apiKeyValidator.isEmpty &&
          (simpleAuthUsers.nonEmpty || oauthSupport.nonEmpty)) {
        ex.getResponseHeaders.set("WWW-Authenticate",
          if (simpleAuthUsers.nonEmpty) "Basic" else "Bearer")
        respond(ex, 401, """{"detail":"unauthorized"}""")
      } else respond(ex, 403, """{"detail":"unauthorized"}""")

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def respondBytes(ex: HttpExchange, code: Int, bytes: Array[Byte],
      contentType: String): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** K4 web surface — mount a [[graft.sinks.ViewServer]] so its named
    * views serve at `/api/v1/table/...` (reference perspective.py table
    * mounts; the `/arrow` variant ships the Arrow IPC stream a
    * Perspective browser table loads directly). When `refreshMillis`
    * is set, the periodic refresh loop is OWNED by this gateway: it
    * starts with [[start]] (never before the runtime is live) and is
    * interrupted by [[stop]] — a load-time thread would tick against a
    * not-yet-started runtime and outlive a stopped one. */
  @volatile private var viewServer: Option[graft.sinks.ViewServer] = None
  @volatile private var viewRefreshMillis: Option[Long] = None
  @volatile private var viewRefreshThread: Option[Thread] = None
  def attachViews(vs: graft.sinks.ViewServer, refreshMillis: Option[Long] = None): Unit = {
    viewServer = Some(vs)
    viewRefreshMillis = refreshMillis
  }

  /** Channel-graph visualization data (reference MountChannelsGraph,
    * modules/web/channels_graph.py:14-59): mounting a finalized
    * [[graft.core.ChannelGraph]]'s wiring serves
    * `GET /api/v1/channels_graph` →
    * `{channel: {"getters": [modules], "setters": [modules]}}` plus a
    * minimal browse page at `/channels_graph`. Unmounted → 404 (the
    * reference's route exists only when the module is configured).
    * By-name thunk: the graph may finalize after the mount.
    */
  /** Outputs-folder browser root (reference MountOutputsFolder,
    * modules/web/outputs.py:21-70): when set, `/outputs/{path}` lists
    * directories as link pages and streams files (text types render
    * in-browser). Canonical-path containment guards traversal. */
  @volatile private var outputsDir: Option[java.nio.file.Path] = None
  def attachOutputsFolder(dir: String): Unit =
    outputsDir = Some(java.nio.file.Paths.get(dir).toAbsolutePath.normalize())

  private def handleOutputs(ex: HttpExchange, root: java.nio.file.Path): Unit = {
    val rel = ex.getRequestURI.getPath.stripPrefix("/outputs").stripPrefix("/")
    val target = root.resolve(
      java.net.URLDecoder.decode(rel, "UTF-8")).toAbsolutePath.normalize()
    if (!target.startsWith(root) || !java.nio.file.Files.exists(target))
      respond(ex, 404, s"""{"detail":"Not found: /outputs/$rel"}""")
    else if (java.nio.file.Files.isDirectory(target)) {
      val base = ("/outputs/" + rel).stripSuffix("/")
      val items = java.nio.file.Files.list(target).iterator().asScala.toSeq
        .map(_.getFileName.toString).sorted
        .map { f =>
          val esc = f.replace("&", "&amp;").replace("<", "&lt;")
          s"""<li><a href="$base/${java.net.URLEncoder.encode(f, "UTF-8")}">$esc</a></li>"""
        }.mkString
      val html =
        s"""<!DOCTYPE html><html><head><title>Outputs</title></head>
           |<body><h1>$base</h1><ul>$items</ul></body></html>""".stripMargin
      respondBytes(ex, 200, html.getBytes(StandardCharsets.UTF_8), "text/html")
    } else {
      val name = target.getFileName.toString
      val contentType =
        if (name.endsWith(".log") || name.endsWith(".txt"))
          "text/plain; charset=utf-8" // browser-viewable, like the reference
        else Option(java.nio.file.Files.probeContentType(target))
          .getOrElse("application/octet-stream")
      respondBytes(ex, 200, java.nio.file.Files.readAllBytes(target), contentType)
    }
  }

  @volatile private var channelsGraphData:
      Option[() => Map[String, graft.core.ChannelConnections]] = None
  def attachChannelsGraph(g: => Map[String, graft.core.ChannelConnections]): Unit =
    channelsGraphData = Some(() => g)

  private def channelsGraphJson: Option[String] = channelsGraphData.map { thunk =>
    val root = mapper.createObjectNode()
    thunk().toSeq.sortBy(_._1).foreach { case (ch, conns) =>
      val node = root.putObject(ch)
      val getters = node.putArray("getters")
      conns.getters.foreach(getters.add)
      val setters = node.putArray("setters")
      conns.setters.foreach(setters.add)
    }
    mapper.writeValueAsString(root)
  }

  private def rowsJson(name: String, rows: Seq[org.apache.spark.sql.Row]): String = {
    val schema = runtime.runtimeSchema(runtime.specs(name))
    val arr = mapper.createArrayNode()
    rows.foreach(r => arr.add(EngineLog.rowToJson(mapper, r, schema)))
    mapper.writeValueAsString(arr)
  }

  /** X13 row-level security: keep only rows owned by the identity. */
  private def identityFilter(
      name: String, identity: Option[String],
      rows: Seq[org.apache.spark.sql.Row]): Seq[org.apache.spark.sql.Row] =
    (authFilterFields.get(name), identity) match {
      case (Some(field), Some(id)) =>
        val schema = runtime.runtimeSchema(runtime.specs(name))
        val i = schema.fieldNames.indexOf(field)
        if (i < 0) rows else rows.filter(r => !r.isNullAt(i) && String.valueOf(r.get(i)) == id)
      case (Some(_), None) => Nil // auth-filtered channel, anonymous caller
      case _ => rows
    }

  /** X13 over an arbitrary row set (mounted views carry their own
    * compiled schema, not a channel schema): caller's rows only;
    * anonymous callers of a filtered surface see nothing. */
  private def identityFilterRows(
      rows: Seq[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType,
      field: String,
      identity: Option[String]): Seq[org.apache.spark.sql.Row] =
    identity match {
      case Some(id) =>
        val i = schema.fieldNames.indexOf(field)
        if (i < 0) Nil
        else rows.filter(r => !r.isNullAt(i) && String.valueOf(r.get(i)) == id)
      case None => Nil
    }

  private def handle(ex: HttpExchange): Unit =
    try {
      val path = ex.getRequestURI.getPath.stripPrefix("/api/v1/")
      val parts = path.split("/").toList
      // X13 identity: explicit header, else the simple-auth principal
      // (reference IdentityAwareMiddlewareMixin: the auth middleware's
      // identity feeds the filter)
      val identity = Option(ex.getRequestHeaders.getFirst("x-identity"))
        .orElse(resolvedIdentity(ex)) // cached by the auth gate — no
                                      // second introspection round trip
      parts match {
        case "whoami" :: Nil =>
          // reference simple.py /whoami: the authenticated identity
          simpleAuthUser(ex) match {
            case Some(u) => respond(ex, 200, s"""{"user":"$u"}""")
            case None if simpleAuthUsers.nonEmpty =>
              respond(ex, 401, """{"detail":"Session not found"}""")
            case None => respond(ex, 404, """{"detail":"Not Found"}""")
          }
        case "last" :: name :: Nil if known(name) =>
          // dict-basket channels return the whole basket: one row per
          // key, key-sorted (reference last.py:84-111 get_last_basket)
          val rows =
            if (isBasket(name))
              runtime.lastByBasketKey(name).toSeq
                .sortBy(kv => String.valueOf(kv._1)).map(_._2)
            else runtime.last(name).toSeq
          respond(ex, 200, rowsJson(name, identityFilter(name, identity, rows)))
        case "last" :: name :: key :: Nil if isBasket(name) =>
          // per-key last (reference last.py:36-76): a key outside the
          // channel's key set → 404 (same admissibility rule as /next
          // and /send — open key domains admit every key);
          // admissible-but-unticked → []
          if (!keyDeclared(name, key))
            respond(ex, 404, s"""{"detail":"Channel not found: $name/$key"}""")
          else {
            val observed = runtime.lastByBasketKey(name).collectFirst {
              case (k, row) if String.valueOf(k) == key => row
            }
            respond(ex, 200, rowsJson(name, identityFilter(name, identity, observed.toSeq)))
          }
        case "next" :: name :: Nil if known(name) =>
          val r = runtime.awaitNext(name, 30.seconds)
          respond(ex, 200, rowsJson(name, identityFilter(name, identity, r.toSeq)))
        case "next" :: name :: key :: Nil if isBasket(name) =>
          // per-key next (reference futures/adapter.py:99-127); keys
          // outside a declared key set → 404
          if (!keyDeclared(name, key))
            respond(ex, 404, s"""{"detail":"Channel not found: $name/$key"}""")
          else {
            val r = runtime.awaitNextByKey(name, key, 30.seconds)
            respond(ex, 200, rowsJson(name, identityFilter(name, identity, r.toSeq)))
          }
        case "state" :: name :: Nil if known(name) =>
          val q = queryParam(ex).map(QueryTranslator.parseJson)
            .getOrElse(graft.state.StateQuery())
          val rows =
            try runtime.state(name, q)
            catch { case NonFatal(_) => Nil } // reference: errors → []
          respond(ex, 200, rowsJson(name, identityFilter(name, identity, rows)))
        case "lookup" :: name :: id :: Nil if known(name) =>
          identityFilter(name, identity, runtime.lookup(name, id).toSeq) match {
            case Seq(row) =>
              val schema = runtime.runtimeSchema(runtime.specs(name))
              respond(ex, 200, mapper.writeValueAsString(EngineLog.rowToJson(mapper, row, schema)))
            case _ => respond(ex, 404, """{"detail":"id not found"}""")
          }
        case "stream" :: name :: Nil if known(name) =>
          handleStream(ex, name)
        case "table" :: Nil =>
          val arr = mapper.createArrayNode()
          viewServer.map(_.names).getOrElse(Nil).foreach(arr.add)
          respond(ex, 200, mapper.writeValueAsString(arr))
        case "table" :: vname :: rest if rest.isEmpty || rest == List("arrow") =>
          viewServer.flatMap(vs => vs.snapshotWithSchema(vname)
            .map(s => (vs.channelOf(vname), s))) match {
            case None if viewServer.exists(_.names.contains(vname)) =>
              // defined but the first refresh hasn't landed yet: the
              // name IS in GET /table, so 404 would contradict the
              // listing. JSON serves the empty row set; arrow can't
              // (the compiled schema only exists post-refresh) → 503
              if (rest.isEmpty) respond(ex, 200, "[]")
              else {
                ex.getResponseHeaders.set("Retry-After", "2")
                respond(ex, 503, s"""{"detail":"Table not ready: $vname"}""")
              }
            case None =>
              val err = mapper.createObjectNode()
              err.put("detail", s"Table not found: $vname")
              respond(ex, 404, mapper.writeValueAsString(err))
            case Some((channel, (rawRows, schema))) =>
              // X13 parity: a table over an identity-filtered channel
              // serves only the caller's rows — and if the view's
              // projection dropped the auth field (aggregates), it
              // serves nothing rather than leaking everyone's rows
              val authField = channel.flatMap(authFilterFields.get)
              val rows = authField match {
                case None => rawRows
                case Some(f) if schema.fieldNames.contains(f) =>
                  identityFilterRows(rawRows, schema, f, identity)
                case Some(_) => Nil
              }
              if (rest.isEmpty) {
                val arr = mapper.createArrayNode()
                rows.foreach(r => arr.add(EngineLog.rowToJson(mapper, r, schema)))
                respond(ex, 200, mapper.writeValueAsString(arr))
              } else
                respondBytes(ex, 200,
                  org.apache.spark.sql.graft.ArrowBridge.toArrowStream(rows, schema),
                  "application/vnd.apache.arrow.stream")
          }
        case "send" :: name :: rest if known(name) && rest.size <= 1 &&
            ex.getRequestMethod == "POST" && (rest.isEmpty || isBasket(name)) =>
          // /send/{ch} or /send/{ch}/{key} (reference send.py:41-87):
          // the path key is injected as the basket key column
          val keyOpt = rest.headOption
          if (keyOpt.exists(k => !keyDeclared(name, k))) {
            respond(ex, 404, s"""{"detail":"Channel not found: $name/${keyOpt.get}"}""")
            return
          }
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val node = mapper.readTree(body)
          val objs: Seq[JsonNode] =
            if (node.isArray) node.elements().asScala.toSeq else Seq(node)
          val keyCol = runtime.specs(name).basketKey
          val maps = objs.map { o =>
            val m = jsonToMap(o)
            (keyCol, keyOpt) match {
              case (Some(col), Some(k)) => m + (col -> k)
              case _                    => m
            }
          }
          // X13 write validation: rows must carry the caller's identity
          authFilterFields.get(name).foreach { field =>
            // the auth field must be PRESENT and equal — a row omitting
            // it must not slip past validation
            identity match {
              case Some(id) if maps.forall(m =>
                m.get(field).exists(v => String.valueOf(v) == id)) => ()
              case _ => throw new IllegalArgumentException(s"identity mismatch on '$field'")
            }
          }
          try {
            val rows = runtime.send(name, maps)
            respond(ex, 200, rowsJson(name, rows))
          } catch {
            case e: IllegalArgumentException =>
              respond(ex, 422, s"""{"detail":${mapper.writeValueAsString(e.getMessage)}}""")
          }
        // static-field routes (reference MountFieldRestRoutes,
        // mount_fields.py:10-82): GET /field → names, GET
        // /field/{name} → the JSON-serialized value, 404 unknown
        case "field" :: Nil if ex.getRequestMethod == "GET" =>
          val arr = mapper.createArrayNode()
          staticFields.keys.toSeq.sorted.foreach(arr.add)
          respond(ex, 200, mapper.writeValueAsString(arr))
        case "field" :: fname :: Nil if ex.getRequestMethod == "GET" =>
          staticFields.get(fname) match {
            case Some(v) => respond(ex, 200, mapper.writeValueAsString(anyToJsonNode(v)))
            case None =>
              respond(ex, 404,
                s"""{"detail":${mapper.writeValueAsString(s"Channel field not found: $fname")}}""")
          }
        // available-channels listing per route family (reference
        // last.py:160-170 add_*_available_channels: GET /last/ → names)
        case family :: rest if AvailableFamilies(family) &&
            (rest.isEmpty || rest == List("")) && ex.getRequestMethod == "GET" =>
          val names = runtime.specs.keys.toSeq.sorted
          respond(ex, 200, mapper.writeValueAsString(names.toArray))
        // controls (reference routes/controls.py): heartbeat / stats /
        // shutdown — the UI kill-switch + liveness surface
        case "channels_graph" :: Nil if ex.getRequestMethod == "GET" =>
          channelsGraphJson match {
            case Some(json) => respond(ex, 200, json)
            case None       => respond(ex, 404, """{"detail":"Not Found"}""")
          }
        case "controls" :: "heartbeat" :: Nil if ex.getRequestMethod == "GET" =>
          respond(ex, 200,
            s"""{"name":"heartbeat","status":"ok","timestamp":"${java.time.Instant.now()}"}""")
        case "controls" :: "stats" :: Nil if ex.getRequestMethod == "GET" =>
          val rt = Runtime.getRuntime
          val data = Map(
            "cpu" -> rt.availableProcessors(),
            "memory" -> (rt.totalMemory() - rt.freeMemory()),
            "memory-total" -> rt.maxMemory(),
            "now" -> java.time.Instant.now().toString,
            "host" -> java.net.InetAddress.getLocalHost.getHostName,
            "user" -> System.getProperty("user.name", ""))
          respond(ex, 200, mapper.writeValueAsString(
            Map("name" -> "stats", "status" -> "ok", "data" -> data.asJava).asJava))
        case "controls" :: "shutdown" :: Nil if ex.getRequestMethod == "POST" =>
          respond(ex, 200, """{"name":"shutdown","status":"ok"}""")
          // background, like the reference's BackgroundTasks: the
          // response must flush before the server dies. onShutdown lets
          // the launcher take down the runtime/session/process too —
          // stopping only the listeners would leave a zombie JVM
          new Thread(() => {
            Thread.sleep(100); stop(); onShutdown()
          }, "graft-shutdown").start()
        case _ => respond(ex, 404, """{"detail":"Not Found"}""")
      }
    } catch {
      case e: IllegalArgumentException =>
        respond(ex, 422, s"""{"detail":${mapper.writeValueAsString(e.getMessage)}}""")
      case NonFatal(e) =>
        respond(ex, 500, s"""{"detail":${mapper.writeValueAsString(String.valueOf(e.getMessage))}}""")
    }

  /** K8/K9 — streaming egress: server-sent events, one `data:` frame
    * per tick (the reference's websocket fanout re-expressed on the
    * JDK server; frame payload matches `{"channel","data"}` shape,
    * websocket.py:183-225) plus 1s heartbeat pings (websocket.py:38).
    * Demand-driven: the listener exists only while the client is
    * connected. `?max_events=N` closes after N data frames (testing).
    */
  private def handleStream(ex: HttpExchange, name: String): Unit = {
    val maxEvents = Option(ex.getRequestURI.getRawQuery)
      .flatMap(_.split("&").collectFirst {
        case kv if kv.startsWith("max_events=") => kv.stripPrefix("max_events=").toLong
      }).getOrElse(Long.MaxValue)
    ex.getResponseHeaders.set("Content-Type", "text/event-stream")
    ex.getResponseHeaders.set("Cache-Control", "no-cache")
    ex.sendResponseHeaders(200, 0)
    val os = ex.getResponseBody
    val queue = new java.util.concurrent.LinkedBlockingQueue[String]
    val schema = runtime.runtimeSchema(runtime.specs(name))
    val listener: (String, Seq[org.apache.spark.sql.Row]) => Unit = (ch, rows) =>
      if (ch == name) rows.foreach { r =>
        val frame = mapper.createObjectNode()
        frame.put("channel", name)
        frame.set[JsonNode]("data", EngineLog.rowToJson(mapper, r, schema))
        queue.offer(mapper.writeValueAsString(frame))
      }
    runtime.addListener(listener)
    try {
      var sent = 0L
      var open = true
      while (open && sent < maxEvents) {
        val item = queue.poll(1, java.util.concurrent.TimeUnit.SECONDS)
        try {
          if (item == null) os.write(": ping\n\n".getBytes(StandardCharsets.UTF_8)) // K9
          else { os.write(s"data: $item\n\n".getBytes(StandardCharsets.UTF_8)); sent += 1 }
          os.flush()
        } catch { case _: java.io.IOException => open = false }
      }
    } finally {
      runtime.removeListener(listener)
      ex.close()
    }
  }

  // ---- OpenAPI/docs surface (reference test_webserver.py:80-110:
  // GET /openapi.json → {"info":{"title":"Gateway",...},"paths":{...}};
  // route entries carry the channel row type) ----------------------------

  private def structToJsonSchema(st: org.apache.spark.sql.types.StructType): JsonNode = {
    import org.apache.spark.sql.types._
    def typeNode(dt: DataType): com.fasterxml.jackson.databind.node.ObjectNode = {
      val n = mapper.createObjectNode()
      dt match {
        case ByteType | ShortType | IntegerType | LongType => n.put("type", "integer")
        case FloatType | DoubleType | _: DecimalType => n.put("type", "number")
        case BooleanType => n.put("type", "boolean")
        case TimestampType => n.put("type", "string"); n.put("format", "date-time")
        case ArrayType(et, _) => n.put("type", "array"); n.set[JsonNode]("items", typeNode(et))
        case s: StructType =>
          n.put("type", "object")
          val props = n.putObject("properties")
          s.fields.foreach(f => props.set[JsonNode](f.name, typeNode(f.dataType)))
        case _ => n.put("type", "string")
      }
      n
    }
    typeNode(st)
  }

  private def openApiJson: String = {
    val root = mapper.createObjectNode()
    root.put("openapi", "3.1.0")
    val info = root.putObject("info")
    info.put("title", "Gateway")
    info.put("version", Gateway.Version)
    val paths = root.putObject("paths")
    val comps = root.putObject("components").putObject("schemas")
    runtime.specs.toSeq.sortBy(_._1).foreach { case (name, spec) =>
      val schemaName = name.capitalize
      comps.set[JsonNode](schemaName, structToJsonSchema(runtime.runtimeSchema(spec)))
      def op(verb: String, path: String, summary: String): Unit = {
        val o = paths.withObjectProperty(path).putObject(verb)
        o.put("summary", summary)
        o.put("type_", schemaName) // route row type, reference openapi_extra
        val resp = o.putObject("responses").putObject("200")
        resp.put("description", "rows")
        resp.putObject("content").putObject("application/json").putObject("schema")
          .put("$ref", s"#/components/schemas/$schemaName")
      }
      op("get", s"/api/v1/last/$name", s"Get Last $name")
      op("get", s"/api/v1/next/$name", s"Get Next $name")
      op("get", s"/api/v1/state/$name", s"Get State $name")
      op("get", s"/api/v1/lookup/$name/{id}", s"Lookup $name by id")
      op("get", s"/api/v1/stream/$name", s"Stream $name (SSE)")
      op("post", s"/api/v1/send/$name", s"Send $name")
      if (spec.basketKey.isDefined) {
        op("get", s"/api/v1/last/$name/{key}", s"Get Last $name by key")
        op("get", s"/api/v1/next/$name/{key}", s"Get Next $name by key")
        op("post", s"/api/v1/send/$name/{key}", s"Send $name by key")
      }
    }
    // family listings + controls (reference controls.py, *_available_channels)
    Seq("last", "next", "state", "send", "lookup", "stream").foreach { f =>
      paths.withObjectProperty(s"/api/v1/$f/").putObject("get")
        .put("summary", s"Available channels under /$f")
    }
    if (channelsGraphData.isDefined)
      paths.withObjectProperty("/api/v1/channels_graph").putObject("get")
        .put("summary", "Channel/module wiring graph data")
    if (staticFields.nonEmpty) {
      paths.withObjectProperty("/api/v1/field").putObject("get")
        .put("summary", "Available static fields")
      staticFields.keys.toSeq.sorted.foreach { f =>
        paths.withObjectProperty(s"/api/v1/field/$f").putObject("get")
          .put("summary", s"Get Channel field $f")
      }
    }
    if (oauthSupport.isDefined) {
      paths.withObjectProperty("/login").putObject("get")
        .put("summary", "Redirect to the OAuth2 authorization endpoint")
      paths.withObjectProperty("/auth/callback").putObject("get")
        .put("summary", "OAuth2 authorization-code callback")
      paths.withObjectProperty("/auth/logout").putObject("get")
        .put("summary", "Drop the OAuth session")
      paths.withObjectProperty("/auth/userinfo").putObject("get")
        .put("summary", "Authenticated session's userinfo claims")
    }
    paths.withObjectProperty("/api/v1/controls/heartbeat").putObject("get")
      .put("summary", "Liveness ping")
    paths.withObjectProperty("/api/v1/controls/stats").putObject("get")
      .put("summary", "Engine and system stats")
    paths.withObjectProperty("/api/v1/controls/shutdown").putObject("post")
      .put("summary", "Clean shutdown (kill switch)")
    mapper.writeValueAsString(root)
  }

  private val docsHtml =
    """<!DOCTYPE html><html><head><title>Gateway API</title></head>
      |<body><h1>Gateway API</h1>
      |<p>OpenAPI document: <a href="/openapi.json">/openapi.json</a></p>
      |</body></html>""".stripMargin

  /** Route families with an available-channels listing at GET /{f}/. */
  private val AvailableFamilies =
    Set("last", "next", "state", "send", "lookup", "stream")

  private def known(name: String): Boolean = runtime.specs.contains(name)

  private def isBasket(name: String): Boolean =
    runtime.specs.get(name).exists(_.basketKey.isDefined)

  /** Key admissible for a basket channel: inside the declared key set,
    * or any key when the domain is open (str-typed basket). */
  private def keyDeclared(name: String, key: String): Boolean =
    runtime.specs.get(name).forall(_.basketKeys.forall(_.contains(key)))

  private def queryParam(ex: HttpExchange): Option[String] =
    Option(ex.getRequestURI.getRawQuery).flatMap(_.split("&").collectFirst {
      case kv if kv.startsWith("query=") =>
        java.net.URLDecoder.decode(kv.stripPrefix("query="), "UTF-8")
    })

  private def jsonValue(v: JsonNode): Any =
    if (v.isNull) null
    else if (v.isIntegralNumber) v.asLong()
    else if (v.isFloatingPointNumber) v.asDouble()
    else if (v.isBoolean) v.asBoolean()
    else if (v.isArray) v.elements().asScala.map(jsonValue).toSeq
    else if (v.isObject)
      v.properties().asScala.map(e => e.getKey -> jsonValue(e.getValue)).toMap
    else v.asText()

  private def jsonToMap(node: JsonNode): Map[String, Any] =
    node.properties().asScala.map(e => e.getKey -> jsonValue(e.getValue)).toMap

  /** JSON-serialize a static-field value (Scala maps/seqs aren't
    * Jackson-native; the reference requires "JSON serializable"
    * fields — same contract here). */
  private def anyToJsonNode(v: Any): JsonNode = v match {
    case null         => mapper.nullNode()
    case x: String    => mapper.getNodeFactory.textNode(x)
    case x: Long      => mapper.getNodeFactory.numberNode(x)
    case x: Int       => mapper.getNodeFactory.numberNode(x.toLong)
    case x: Double    => mapper.getNodeFactory.numberNode(x)
    case x: Float     => mapper.getNodeFactory.numberNode(x.toDouble)
    case x: Boolean   => mapper.getNodeFactory.booleanNode(x)
    case x: Map[_, _] =>
      val o = mapper.createObjectNode()
      x.foreach { case (k, value) => o.set[JsonNode](String.valueOf(k), anyToJsonNode(value)) }
      o
    case x: Iterable[_] =>
      val a = mapper.createArrayNode()
      x.foreach(e => a.add(anyToJsonNode(e)))
      a
    case x => mapper.getNodeFactory.textNode(String.valueOf(x))
  }

  /** Session cookie attributes (reference set_cookie: HttpOnly,
    * max-age = session timeout). */
  private def sessionSetCookie(uuid: String): String =
    s"$sessionCookieName=$uuid; HttpOnly; Path=/; Max-Age=${sessionTimeoutMillis / 1000}"

  private def redirect(ex: HttpExchange, location: String,
      setCookie: Option[String]): Unit = {
    ex.getResponseHeaders.set("Location", location)
    setCookie.foreach(ex.getResponseHeaders.set("Set-Cookie", _))
    ex.sendResponseHeaders(303, -1)
    ex.close()
  }

  /** `/login` (reference simple.py:356-418): form POST or HTTP Basic;
    * success mints a session and redirects to `/` with the cookie set
    * (the reference's RedirectResponse), invalid Basic gets the 401
    * challenge, a bare GET renders the login form.
    */
  private def handleLogin(ex: HttpExchange): Unit =
    try {
      if (ex.getRequestMethod == "POST") {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val form = body.split("&").flatMap(_.split("=", 2) match {
          case Array(k, v) => Some(java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8"))
          case _ => None
        }).toMap
        (form.get("username"), form.get("password")) match {
          case (Some(u), Some(p)) if u.nonEmpty && p.nonEmpty =>
            if (simpleAuthUsers.get(u).contains(p))
              redirect(ex, "/", Some(sessionSetCookie(createSession(u))))
            else redirect(ex, "/login?error=invalid_credentials", None)
          case _ => redirect(ex, "/login?error=missing_credentials", None)
        }
      } else if (Option(ex.getRequestHeaders.getFirst("Authorization")).exists(_.startsWith("Basic "))) {
        basicUser(ex) match {
          case Some(u) => redirect(ex, "/", Some(sessionSetCookie(createSession(u))))
          case None =>
            ex.getResponseHeaders.set("WWW-Authenticate", "Basic")
            respond(ex, 401, """{"detail":"unauthorized"}""")
        }
      } else {
        val err = Option(ex.getRequestURI.getRawQuery)
          .filter(_.contains("error=")).map(_ => "<p>Invalid credentials.</p>").getOrElse("")
        val html =
          s"""<!DOCTYPE html><html><head><title>Login</title></head><body>
             |<h1>Login</h1>$err
             |<form method="post" action="/login">
             |<label>Username <input name="username"/></label>
             |<label>Password <input name="password" type="password"/></label>
             |<button type="submit">Log in</button></form>
             |</body></html>""".stripMargin
        respondBytes(ex, 200, html.getBytes(StandardCharsets.UTF_8), "text/html")
      }
    } catch {
      case NonFatal(e) => respond(ex, 500, s"""{"detail":"${e.getMessage}"}""")
    }

  /** `/logout` (reference simple.py:420-428): drop the session, expire
    * the cookie, redirect to the login page.
    */
  private def handleLogout(ex: HttpExchange): Unit = {
    cookie(ex, sessionCookieName).foreach(sessions.remove)
    ex.getResponseHeaders.set("Set-Cookie",
      s"$sessionCookieName=; HttpOnly; Path=/; Max-Age=0")
    redirect(ex, "/login", None)
  }

  /** OAuth2 route handlers (reference oauth.py:259-345 `rest`):
    * /login redirects to the issuer's authorize endpoint,
    * /auth/callback exchanges the code, fetches userinfo, mints the
    * session cookie and redirects home; /auth/logout drops the
    * session; /auth/userinfo returns the authenticated session's
    * claims document.
    */
  private def handleOAuth(ex: HttpExchange, o: OAuthSupport): Unit =
    try {
      val path = ex.getRequestURI.getPath
      def queryOf(name: String): Option[String] =
        Option(ex.getRequestURI.getRawQuery).flatMap(_.split("&").collectFirst {
          case kv if kv.startsWith(name + "=") =>
            java.net.URLDecoder.decode(kv.stripPrefix(name + "="), "UTF-8")
        })
      // configured URI wins — deriving it from the Host header lets a
      // spoofed Host steer the issuer's redirect (ADVICE r8)
      def callbackUri: String = o.configuredRedirectUri.getOrElse {
        val host = Option(ex.getRequestHeaders.getFirst("Host"))
          .getOrElse(s"127.0.0.1:$boundPort")
        s"http://$host/auth/callback"
      }
      path match {
        case "/auth/callback" =>
          (queryOf("error"), queryOf("code")) match {
            case (Some(err), _) =>
              respond(ex, 400, s"""{"error":${mapper.writeValueAsString(err)}}""")
            case (None, None) =>
              respond(ex, 400, """{"error":"No authorization code provided"}""")
            case (None, Some(_)) if !queryOf("state").exists(o.consumeState) =>
              // CSRF gate: the state must be one this gateway minted at
              // /login (one-shot, TTL-bounded) — else an attacker can
              // inject their own code into a victim's session
              respond(ex, 400, """{"error":"Invalid or missing state parameter"}""")
            case (None, Some(code)) =>
              try {
                val tokens = o.exchangeCode(code, callbackUri)
                Option(tokens.get("access_token")).map(_.asText()) match {
                  case None =>
                    respond(ex, 400, """{"error":"No access token in response"}""")
                  case Some(access) =>
                    o.fetchUserinfo(access) match {
                      case None => respond(ex, 400, """{"error":"userinfo fetch failed"}""")
                      case Some(info) =>
                        val uuid = o.createSession(info)
                        redirect(ex, "/", Some(
                          s"${o.cookieName}=$uuid; HttpOnly; Path=/; " +
                            s"Max-Age=${o.sessionTimeoutMillis / 1000}"))
                    }
                }
              } catch {
                case NonFatal(e) =>
                  respond(ex, 500,
                    s"""{"error":${mapper.writeValueAsString(String.valueOf(e.getMessage))}}""")
              }
          }
        case "/auth/logout" =>
          cookie(ex, o.cookieName).foreach(o.dropSession)
          ex.getResponseHeaders.set("Set-Cookie",
            s"${o.cookieName}=; HttpOnly; Path=/; Max-Age=0")
          redirect(ex, "/login", None)
        case "/auth/userinfo" =>
          cookie(ex, o.cookieName).flatMap(o.sessionUserinfo)
            .orElse(o.userinfoFrom(
              Option(ex.getRequestHeaders.getFirst("Authorization")))) match {
            case Some(info) => respond(ex, 200, mapper.writeValueAsString(info))
            case None       => respond(ex, 401, """{"detail":"Session not found"}""")
          }
        case _ if path == "/login" || path == "/auth/login" =>
          redirect(ex, o.loginRedirectUrl(callbackUri), None)
        case _ => respond(ex, 404, """{"detail":"Not Found"}""")
      }
    } catch {
      case NonFatal(e) =>
        respond(ex, 500,
          s"""{"detail":${mapper.writeValueAsString(String.valueOf(e.getMessage))}}""")
    }

  def start(): Gateway = {
    if (simpleAuthUsers.nonEmpty) {
      server.createContext("/login", (ex: HttpExchange) => handleLogin(ex))
      server.createContext("/logout", (ex: HttpExchange) => handleLogout(ex))
    }
    oauthSupport.foreach { o =>
      server.createContext("/auth", (ex: HttpExchange) => handleOAuth(ex, o))
      // simple auth keeps /login when both are mounted (its form can
      // name either path; OAuth login stays reachable at /auth/login)
      if (simpleAuthUsers.isEmpty)
        server.createContext("/login", (ex: HttpExchange) => handleOAuth(ex, o))
    }
    server.createContext("/api/v1", (ex: HttpExchange) => gated(handle)(ex))
    server.createContext("/outputs", (ex: HttpExchange) => gated { e =>
      outputsDir match {
        case Some(root) =>
          try handleOutputs(e, root)
          catch { case NonFatal(err) =>
            respond(e, 500, s"""{"detail":${mapper.writeValueAsString(String.valueOf(err.getMessage))}}""") }
        case None => respond(e, 404, """{"detail":"Not Found"}""")
      }
    }(ex))
    server.createContext("/openapi.json", (ex: HttpExchange) => gated { ex =>
      try respond(ex, 200, openApiJson)
      catch { case NonFatal(e) => respond(ex, 500, s"""{"detail":"${e.getMessage}"}""") }
    }(ex))
    server.createContext("/docs", (ex: HttpExchange) => {
      val bytes = docsHtml.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/html")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    // browse page (reference app_router /channels_graph: a small page
    // rendering the wiring; the interactive JS viz is out of scope —
    // this embeds the same JSON the API route serves)
    server.createContext("/channels_graph", (ex: HttpExchange) =>
      channelsGraphJson match {
        case Some(json) =>
          val html =
            s"""<!DOCTYPE html><html><head><title>Channels Graph</title></head>
               |<body><h1>Channels Graph</h1>
               |<pre id="graph">${json.replace("<", "&lt;")}</pre>
               |<p>Data endpoint: <a href="/api/v1/channels_graph">/api/v1/channels_graph</a></p>
               |</body></html>""".stripMargin
          val bytes = html.getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.set("Content-Type", "text/html")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        case None => respond(ex, 404, """{"detail":"Not Found"}""")
      })
    // table workspace pages (reference modules/web/perspective.py
    // mounts a Perspective viewer workspace; the Perspective JS bundle
    // is out of scope offline — these pages render the SAME data plane
    // (/api/v1/table JSON, auto-refreshed) with dependency-free inline
    // JS, so a browser pointed at the gateway still browses every view)
    server.createContext("/tables", (ex: HttpExchange) => {
      def page(title: String, body: String): Unit = {
        val html =
          s"""<!DOCTYPE html><html><head><title>$title</title><style>
             |body{font-family:sans-serif;margin:2em}table{border-collapse:collapse}
             |td,th{border:1px solid #999;padding:4px 8px;font-size:13px}
             |th{background:#eee}</style></head><body>$body</body></html>""".stripMargin
        val bytes = html.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "text/html")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
      val rest = ex.getRequestURI.getPath.stripPrefix("/tables").stripPrefix("/")
      (viewServer, rest) match {
        case (None, _) => respond(ex, 404, """{"detail":"Not Found"}""")
        case (Some(vs), "") =>
          val items = vs.names.sorted
            .map(n => s"""<li><a href="/tables/$n">$n</a></li>""").mkString
          page("Tables", s"<h1>Tables</h1><ul>$items</ul>" +
            """<p>Data endpoints: <code>/api/v1/table/{name}</code> (JSON), """ +
            """<code>/api/v1/table/{name}/arrow</code> (Arrow IPC)</p>""")
        case (Some(vs), name) if vs.names.contains(name) =>
          // pivot workspace against the JSON data plane (the
          // Perspective-viewer use-case from perspective.py:179-641,
          // re-expressed as dependency-free inline JS so it works in
          // the zero-egress sandbox): group-by over any column set,
          // sum/avg/min/max/count aggregation, per-column filter,
          // click-to-sort headers, row limit — all computed
          // client-side over the fetched frame, live-refreshed.
          // Cell values are client-supplied via /send — escape them
          // (and column names), or a value like <img onerror=…> is
          // stored XSS against anyone viewing the page
          page(s"Table $name",
            s"""<h1>$name</h1>
               |<div id="ctl" class="ctl"></div>
               |<div id="t">loading…</div><script>
               |'use strict';
               |const esc = s => String(s).replace(/&/g,'&amp;').replace(/</g,'&lt;')
               |  .replace(/>/g,'&gt;').replace(/"/g,'&quot;');
               |const state = {groupBy: [], splitBy: '', agg: 'count', aggCol: '',
               |               sortCol: '', sortDir: 1,
               |               filterCol: '', filterOp: '==', filterVal: '',
               |               limit: 500, cols: [], view: 'grid', exprs: []};
               |let raw = [];
               |// computed expression columns (the Perspective ExprTK
               |// use-case, perspective.py:133-142): 'name = "col" * 2'
               |// entries, ';'-separated. A tiny recursive-descent parser —
               |// NEVER eval/Function: the page already defends stored XSS
               |// from /send values, and an expression evaluator must not
               |// reopen arbitrary-JS execution through a shared URL or a
               |// pasted workspace config. Grammar: add/sub over mul/div/mod
               |// over unary-minus/parens/number/"column-ref"/fn(arg) with
               |// fn in abs sqrt round floor ceil log exp; null propagates.
               |function compileExpr(src){
               |  let i = 0;
               |  const fail = m => { throw new Error('expr: ' + m + ' near pos ' + i); };
               |  const ws = () => { while (i < src.length && src[i] === ' ') i++; };
               |  const FNS = {abs: Math.abs, sqrt: Math.sqrt, round: Math.round,
               |               floor: Math.floor, ceil: Math.ceil, log: Math.log, exp: Math.exp};
               |  function atom(){
               |    ws();
               |    if (src[i] === '(') { i++; const e = add(); ws();
               |      if (src[i++] !== ')') fail("missing ')'"); return e; }
               |    if (src[i] === '-') { i++; const e = atom();
               |      return r => { const v = e(r); return v === null ? null : -v; }; }
               |    if (src[i] === '"') { const j = src.indexOf('"', i + 1);
               |      if (j < 0) fail('unterminated column ref');
               |      const c = src.slice(i + 1, j); i = j + 1;
               |      return r => { const v = r[c];
               |        return typeof v === 'number' ? v : v === null || v === undefined ? null : Number(v); }; }
               |    let m = /^[0-9]+(\\.[0-9]+)?/.exec(src.slice(i));
               |    if (m) { i += m[0].length; const n = Number(m[0]); return () => n; }
               |    m = /^[a-z]+/.exec(src.slice(i));
               |    if (m && FNS[m[0]]) { const f = FNS[m[0]]; i += m[0].length; ws();
               |      if (src[i++] !== '(') fail("missing '(' after fn"); const e = add(); ws();
               |      if (src[i++] !== ')') fail("missing ')' after fn arg");
               |      return r => { const v = e(r); return v === null || isNaN(v) ? null : f(v); }; }
               |    fail('unparseable');
               |  }
               |  function bin(next, ops){
               |    return function(){
               |      let e = next();
               |      for (;;) { ws(); const op = ops[src[i]];
               |        if (!op) return e;
               |        i++; const l = e, rhs = next();
               |        e = r => { const a = l(r), b = rhs(r);
               |          return a === null || b === null ? null : op(a, b); };
               |      }
               |    };
               |  }
               |  const mul = bin(atom, {'*': (a,b) => a*b, '/': (a,b) => b === 0 ? null : a/b,
               |                         '%': (a,b) => b === 0 ? null : a%b});
               |  const add = bin(mul, {'+': (a,b) => a+b, '-': (a,b) => a-b});
               |  const e = add(); ws();
               |  if (i < src.length) fail('trailing input');
               |  return e;
               |}
               |// 'name = expr; name2 = expr2' -> state.exprs; throws on a
               |// malformed entry (apply shows the message, state unchanged)
               |function setExprs(text){
               |  const out = [];
               |  for (const part of String(text).split(';')) {
               |    if (!part.trim()) continue;
               |    const eq = part.indexOf('=');
               |    if (eq < 0) throw new Error('expr: expected name = expression');
               |    const name = part.slice(0, eq).trim();
               |    if (!/^[A-Za-z_][A-Za-z0-9_ ]*$$/.test(name)) throw new Error('expr: bad name ' + name);
               |    out.push({name: name, fn: compileExpr(part.slice(eq + 1).trim())});
               |  }
               |  state.exprs = out;
               |}
               |function withComputed(rows){
               |  if (!state.exprs.length) return rows;
               |  return rows.map(r => {
               |    const o = Object.assign({}, r);
               |    for (const ex of state.exprs) {
               |      let v = null;
               |      try { v = ex.fn(o); } catch (e) { v = null; }
               |      o[ex.name] = typeof v === 'number' && !isFinite(v) ? null : v;
               |    }
               |    return o;
               |  });
               |}
               |function cmp(a, b){
               |  if (a === b) return 0;
               |  if (a === null || a === undefined) return -1;
               |  if (b === null || b === undefined) return 1;
               |  if (typeof a === 'number' && typeof b === 'number') return a - b;
               |  return String(a) < String(b) ? -1 : 1;
               |}
               |function applyFilter(rows){
               |  if (!state.filterCol || state.filterVal === '') return rows;
               |  const c = state.filterCol, v = state.filterVal;
               |  const n = Number(v), useNum = v !== '' && !isNaN(n);
               |  return rows.filter(r => {
               |    const x = r[c];
               |    const [xa, va] = (useNum && typeof x === 'number') ? [x, n] : [String(x), v];
               |    switch (state.filterOp) {
               |      case '==': return xa === va; case '!=': return xa !== va;
               |      case '<':  return xa <  va;  case '<=': return xa <= va;
               |      case '>':  return xa >  va;  case '>=': return xa >= va;
               |      case 'contains': return String(x).indexOf(v) >= 0;
               |      default: return true;
               |    }
               |  });
               |}
               |function aggCell(g){
               |  // numeric aggregates divide/report over the NUMERIC value
               |  // count (g.cnt), SQL-style: nulls neither dilute an avg nor
               |  // turn an all-null group's sum into 0
               |  return state.agg === 'count' ? g.n
               |    : state.agg === 'sum' ? (g.cnt ? g.sum : null)
               |    : state.agg === 'avg' ? (g.cnt ? g.sum / g.cnt : null)
               |    : state.agg === 'min' ? g.min : g.max;
               |}
               |function accumulate(g, r){
               |  g.n += 1;
               |  const x = state.aggCol ? r[state.aggCol] : null;
               |  if (typeof x === 'number') {
               |    g.cnt += 1;
               |    g.sum += x;
               |    g.min = g.min === null ? x : Math.min(g.min, x);
               |    g.max = g.max === null ? x : Math.max(g.max, x);
               |  }
               |}
               |function pivot(rows){
               |  if (!state.groupBy.length) return rows;
               |  const label = state.agg === 'count' ? 'count'
               |    : state.agg + '(' + state.aggCol + ')';
               |  const m = new Map();
               |  const splits = new Set();
               |  for (const r of rows) {
               |    const key = state.groupBy.map(c => JSON.stringify(r[c])).join('\\u0001');
               |    let g = m.get(key);
               |    if (!g) { g = {row: r, subs: new Map(), all: {n:0,cnt:0,sum:0,min:null,max:null}}; m.set(key, g); }
               |    if (state.splitBy) {
               |      // split-by: one aggregate column per split value (the
               |      // Perspective split_by crosstab)
               |      const sv = String(r[state.splitBy]);
               |      splits.add(sv);
               |      let s = g.subs.get(sv);
               |      if (!s) { s = {n:0,cnt:0,sum:0,min:null,max:null}; g.subs.set(sv, s); }
               |      accumulate(s, r);
               |    } else accumulate(g.all, r);
               |  }
               |  const svs = Array.from(splits).sort();
               |  return Array.from(m.values()).map(g => {
               |    const out = {};
               |    for (const c of state.groupBy) out[c] = g.row[c];
               |    if (state.splitBy)
               |      for (const sv of svs) {
               |        const s = g.subs.get(sv);
               |        out[label + ' | ' + sv] = s ? aggCell(s) : null;
               |      }
               |    else out[label] = aggCell(g.all);
               |    return out;
               |  });
               |}
               |// horizontal grouped-bar SVG over the PIVOTED rows — the
               |// Perspective chart-plugin use-case without the JS bundle.
               |// One band per group, one bar per value column (split-by
               |// crosstabs become grouped bars); negatives extend left of a
               |// shared zero baseline; scale = max |value| over the frame.
               |function chartSvg(rows, cols){
               |  const keyCols = state.groupBy.filter(c => cols.indexOf(c) >= 0);
               |  const valCols = cols.filter(c => keyCols.indexOf(c) < 0);
               |  if (!rows.length || !valCols.length)
               |    return '<p>nothing to chart (group by + aggregate first)</p>';
               |  let mx = 0;
               |  for (const r of rows) for (const c of valCols) {
               |    const v = r[c]; if (typeof v === 'number') mx = Math.max(mx, Math.abs(v));
               |  }
               |  if (mx === 0) mx = 1;
               |  const W = 640, L = 180, bh = 12, gap = 6;
               |  const hasNeg = rows.some(r => valCols.some(c => r[c] < 0));
               |  const x0 = hasNeg ? L + (W - L) / 2 : L, span = W - 10 - x0;
               |  const hue = i => 'hsl(' + (i * 67 % 360) + ',60%,45%)';
               |  const gh = valCols.length * bh + gap;
               |  let y = 4, s = '';
               |  for (const r of rows) {
               |    const label = keyCols.map(c => r[c]).join(' / ') || '(all)';
               |    s += '<text x="' + (L - 6) + '" y="' + (y + gh / 2) +
               |      '" text-anchor="end" font-size="11">' + esc(label) + '</text>';
               |    valCols.forEach((c, i) => {
               |      const v = r[c];
               |      if (typeof v === 'number') {
               |        const w = Math.abs(v) / mx * span;
               |        s += '<rect x="' + (v < 0 ? x0 - w : x0) + '" y="' + (y + i * bh) +
               |          '" width="' + Math.max(w, 0.5) + '" height="' + (bh - 2) +
               |          '" fill="' + hue(i) + '"><title>' + esc(c + ' = ' + v) +
               |          '</title></rect>';
               |      }
               |    });
               |    y += gh;
               |  }
               |  s += '<line x1="' + x0 + '" y1="0" x2="' + x0 + '" y2="' + y +
               |    '" stroke="#888"/>';
               |  const legend = valCols.map((c, i) =>
               |    '<tspan fill="' + hue(i) + '">&#9632;</tspan> ' + esc(c)).join('  ');
               |  s += '<text x="' + x0 + '" y="' + (y + 14) + '" font-size="11">' +
               |    legend + '</text>';
               |  return '<svg width="' + W + '" height="' + (y + 22) + '">' + s + '</svg>';
               |}
               |function render(){
               |  let rows = pivot(applyFilter(withComputed(raw)));
               |  if (state.sortCol)
               |    rows = rows.slice().sort((a, b) =>
               |      state.sortDir * cmp(a[state.sortCol], b[state.sortCol]));
               |  rows = rows.slice(0, state.limit);
               |  const cols = rows.length ? Object.keys(rows[0]) : state.cols;
               |  if (state.view === 'bar' && state.groupBy.length) {
               |    document.getElementById('t').innerHTML = chartSvg(rows, cols);
               |    return;
               |  }
               |  let h = '<table><tr>' + cols.map(c =>
               |    '<th class="hdr" data-c="' + esc(c) + '">' + esc(c) +
               |    (state.sortCol === c ? (state.sortDir > 0 ? ' ▲' : ' ▼') : '') +
               |    '</th>').join('') + '</tr>';
               |  for (const row of rows)
               |    h += '<tr>' + cols.map(c => '<td>' + esc(row[c]) + '</td>').join('') + '</tr>';
               |  document.getElementById('t').innerHTML = h + '</table>';
               |  for (const th of document.querySelectorAll('th.hdr'))
               |    th.onclick = () => {
               |      const c = th.getAttribute('data-c');
               |      if (state.sortCol === c) state.sortDir = -state.sortDir;
               |      else { state.sortCol = c; state.sortDir = 1; }
               |      render();
               |    };
               |}
               |function controls(){
               |  const sel = (id, opts, multi) => '<select id="' + id + '"' +
               |    (multi ? ' multiple size="3"' : '') + '>' + opts.map(o =>
               |    '<option value="' + esc(o) + '">' + esc(o || '(none)') +
               |    '</option>').join('') + '</select>';
               |  // expression columns join every column list: group by,
               |  // aggregate over, split by, and filter all accept them
               |  const allCols = state.cols.concat(state.exprs.map(ex => ex.name));
               |  document.getElementById('ctl').innerHTML =
               |    'group by ' + sel('gb', allCols, true) +
               |    ' split by ' + sel('sb', [''].concat(allCols)) +
               |    ' agg ' + sel('agg', ['count','sum','avg','min','max']) +
               |    ' of ' + sel('aggc', [''].concat(allCols)) +
               |    ' filter ' + sel('fc', [''].concat(allCols)) +
               |    sel('fop', ['==','!=','<','<=','>','>=','contains']) +
               |    ' <input id="fv" size="8"> limit <input id="lim" size="5" value="500">' +
               |    ' view ' + sel('vw', ['grid','bar']) +
               |    ' exprs <input id="ex" size="28" placeholder="notional = &quot;qty&quot; * &quot;price&quot;">' +
               |    ' <button id="apply">apply</button> <span id="n"></span> <span id="err"></span>';
               |  document.getElementById('apply').onclick = () => {
               |    document.getElementById('err').textContent = '';
               |    try { setExprs(document.getElementById('ex').value); }
               |    catch (e) { document.getElementById('err').textContent = String(e.message || e); return; }
               |    state.groupBy = Array.from(
               |      document.getElementById('gb').selectedOptions).map(o => o.value);
               |    state.splitBy = document.getElementById('sb').value;
               |    state.agg = document.getElementById('agg').value;
               |    state.aggCol = document.getElementById('aggc').value;
               |    if (state.agg !== 'count' && !state.aggCol) state.agg = 'count';
               |    state.filterCol = document.getElementById('fc').value;
               |    state.filterOp = document.getElementById('fop').value;
               |    state.filterVal = document.getElementById('fv').value;
               |    // 0 is as useless as a negative limit in a browse
               |    // grid (a silently empty table) — treat both as
               |    // "use the default", like the pre-fix || fallback
               |    const lim = parseInt(document.getElementById('lim').value);
               |    state.limit = isNaN(lim) || lim <= 0 ? 500 : lim;
               |    state.view = document.getElementById('vw').value;
               |    // new expression names must join the column selects —
               |    // rebuild, then restore EVERY control from state
               |    rebuildControls();
               |    render();
               |  };
               |}
               |// controls() rebuilds the DOM with default values (empty
               |// group-by, agg=count, limit 500); without restoring from
               |// state the NEXT apply would read the reset DOM and silently
               |// wipe the user's prior configuration (advisor r13) — so
               |// every rebuild goes through here, never bare controls().
               |function syncControls(){
               |  const by = id => document.getElementById(id);
               |  // assigning a value whose option no longer exists (an
               |  // expression column the current apply just removed)
               |  // silently resets the select, and the NEXT apply would
               |  // persist that reset into state (advisor r14) — re-add
               |  // the user's choice as an explicit stale option instead
               |  const setSel = (id, val) => {
               |    const s = by(id); if (!s) return;
               |    s.value = val;
               |    if (val && s.value !== val) {
               |      const o = document.createElement('option');
               |      o.value = val; o.textContent = val + ' (stale)';
               |      s.appendChild(o); s.value = val;
               |      by('err').textContent = 'stale column kept: ' + val;
               |    }
               |  };
               |  const gb = by('gb');
               |  if (gb && gb.options)
               |    for (const o of gb.options)
               |      o.selected = state.groupBy.indexOf(o.value) >= 0;
               |  setSel('sb', state.splitBy);
               |  by('agg').value = state.agg;
               |  setSel('aggc', state.aggCol);
               |  setSel('fc', state.filterCol);
               |  by('fop').value = state.filterOp;
               |  by('fv').value = state.filterVal;
               |  by('lim').value = state.limit;
               |  by('vw').value = state.view;
               |}
               |function rebuildControls(){
               |  const exEl = document.getElementById('ex');
               |  const exText = exEl ? exEl.value : '';
               |  controls();
               |  syncControls();
               |  if (exText) document.getElementById('ex').value = exText;
               |}
               |async function tick(){
               |  const r = await fetch('/api/v1/table/$name');
               |  raw = await r.json();
               |  const cols = raw.length ? Object.keys(raw[0]) : [];
               |  if (cols.join() !== state.cols.join()) { state.cols = cols; rebuildControls(); }
               |  document.getElementById('n').textContent = raw.length + ' rows';
               |  render();
               |}
               |tick(); setInterval(tick, 2000);
               |</script>""".stripMargin)
        case _ => respond(ex, 404, """{"detail":"Table not found"}""")
      }
    })
    server.start()
    ws.start()
    for (vs <- viewServer; ms <- viewRefreshMillis)
      viewRefreshThread = Some(vs.startPeriodicRefresh(ms))
    this
  }

  def stop(): Unit = {
    viewRefreshThread.foreach(_.interrupt())
    viewRefreshThread = None
    ws.stop()
    server.stop(0)
  }
}

object Gateway {
  /** Published library version (surfaced in the OpenAPI document). */
  val Version = "0.3.0"

  /** Idempotent; must run before the first HttpServer is created in
    * the JVM (the JDK server reads it once at config class load). */
  private[server] def enableNoDelay(): Unit =
    if (System.getProperty("sun.net.httpserver.nodelay") == null)
      System.setProperty("sun.net.httpserver.nodelay", "true")
}
