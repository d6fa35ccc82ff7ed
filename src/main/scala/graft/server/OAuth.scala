package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** OAuth2/OIDC middleware config — the analogue of the reference's
  * `MountOAuth2Middleware` (server/middleware/oauth.py:23-70):
  * authorization-code flow against an external issuer, with OIDC
  * discovery for the endpoint URLs, bearer-token validation via
  * introspection or userinfo, and a session-cookie store minted at
  * the callback.
  */
final case class OAuthConfig(
    /** Issuer URL, e.g. http://auth.example:9999 — endpoints are
      * discovered at `{issuer}/.well-known/openid-configuration`
      * unless set explicitly (oauth.py:82-110). */
    issuer: String,
    clientId: String,
    clientSecret: Option[String] = None,
    scopes: Seq[String] = Seq("openid", "profile", "email"),
    tokenUrl: Option[String] = None,
    authorizeUrl: Option[String] = None,
    userinfoUrl: Option[String] = None,
    /** When set, bearer tokens validate via RFC 7662 introspection
      * (`active: true`) instead of the userinfo fallback
      * (oauth.py:141-161, 189-204). */
    introspectionUrl: Option[String] = None,
    /** Userinfo claim that becomes the X13 identity string ("sub"
      * fallback) — the reference hands the whole userinfo dict to the
      * auth filter; this gateway's identity is a single value. */
    identityClaim: String = "preferred_username",
    cookieName: String = "oauth_session",
    sessionTimeoutMillis: Long = 12L * 3600 * 1000,
    /** Configured callback URI. When set, /login and the code
      * exchange use it verbatim; the Host-header fallback is only for
      * unset configs (a spoofed Host must not steer the redirect). */
    redirectUri: Option[String] = None)

/** Runtime half of the OAuth2 middleware: discovery-document cache,
  * code-for-token exchange, bearer validation, and the session
  * identity store. Mounted by [[Gateway]] (routes `/login`,
  * `/auth/callback`, `/auth/logout`, `/auth/userinfo`) and consulted
  * by its auth gate — co-mounted middlewares compose any-one-passes,
  * like the reference's middleware ordering.
  */
final class OAuthSupport(config: OAuthConfig) {

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()

  /** session UUID → (identity string, userinfo JSON, expiry millis) —
    * the reference's `_identity_store` (oauth.py:70). */
  private val sessions =
    new java.util.concurrent.ConcurrentHashMap[String, (String, JsonNode, Long)]()

  // ---- OIDC discovery (oauth.py:80-110) -----------------------------------

  @volatile private var oidcConfig: Option[JsonNode] = None

  private def discovered: JsonNode = oidcConfig.getOrElse {
    val url = s"${config.issuer.stripSuffix("/")}/.well-known/openid-configuration"
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"OIDC discovery failed at $url: ${resp.statusCode()}")
    val node = mapper.readTree(resp.body())
    oidcConfig = Some(node)
    node
  }

  private def endpoint(explicit: Option[String], claim: String, fallback: String): String =
    explicit.getOrElse(
      Option(discovered.get(claim)).map(_.asText())
        .getOrElse(s"${config.issuer}$fallback"))

  def tokenEndpoint: String =
    endpoint(config.tokenUrl, "token_endpoint", "/oauth/token")
  def authorizeEndpoint: String =
    endpoint(config.authorizeUrl, "authorization_endpoint", "/authorize")
  def userinfoEndpoint: String =
    endpoint(config.userinfoUrl, "userinfo_endpoint", "/userinfo")

  /** Outstanding CSRF `state` values minted at /login → expiry
    * millis. The reference mints but never validates its state
    * (oauth.py:277 "Should be stored and validated"); this gateway
    * closes that gap — a callback whose state is absent from this set
    * is rejected, blocking login-CSRF / code-injection. */
  private val pendingStates =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val StateTtlMillis = 10L * 60 * 1000

  /** The /login redirect target (oauth.py:266-280): authorize URL
    * with code-flow parameters; the minted state is registered for
    * one-shot validation at the callback. */
  def loginRedirectUrl(redirectUri: String): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val now = System.currentTimeMillis()
    pendingStates.entrySet().removeIf(e => e.getValue < now)
    val state = java.util.UUID.randomUUID().toString
    pendingStates.put(state, now + StateTtlMillis)
    val params = Seq(
      "client_id" -> config.clientId,
      "redirect_uri" -> redirectUri,
      "response_type" -> "code",
      "scope" -> config.scopes.mkString(" "),
      "state" -> state)
    s"$authorizeEndpoint?${params.map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")}"
  }

  /** One-shot check-and-consume of a callback's state parameter. */
  def consumeState(state: String): Boolean = {
    val exp = pendingStates.remove(state)
    (exp ne null) && exp.longValue() >= System.currentTimeMillis()
  }

  /** The configured (spoof-proof) callback URI, when one was set. */
  def configuredRedirectUri: Option[String] = config.redirectUri

  // ---- token plumbing (oauth.py:112-161) ----------------------------------

  private def formPost(url: String, fields: Seq[(String, String)],
      basicAuth: Option[(String, String)] = None): HttpResponse[String] = {
    val body = fields.map { case (k, v) =>
      s"$k=${java.net.URLEncoder.encode(v, "UTF-8")}"
    }.mkString("&")
    val b = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    basicAuth.foreach { case (u, p) =>
      b.header("Authorization", "Basic " + java.util.Base64.getEncoder
        .encodeToString(s"$u:$p".getBytes(StandardCharsets.UTF_8)))
    }
    http.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  /** Authorization-code → token exchange (oauth.py:112-127). */
  def exchangeCode(code: String, redirectUri: String): JsonNode = {
    val fields = Seq(
      "grant_type" -> "authorization_code",
      "code" -> code,
      "redirect_uri" -> redirectUri,
      "client_id" -> config.clientId) ++
      config.clientSecret.map("client_secret" -> _)
    val resp = formPost(tokenEndpoint, fields)
    require(resp.statusCode() == 200, s"token exchange failed: ${resp.statusCode()}")
    mapper.readTree(resp.body())
  }

  /** Userinfo for an access token (oauth.py:129-139); None on any
    * failure (invalid token). */
  def fetchUserinfo(accessToken: String): Option[JsonNode] =
    try {
      val resp = http.send(
        HttpRequest.newBuilder(URI.create(userinfoEndpoint))
          .header("Authorization", s"Bearer $accessToken").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() == 200) Some(mapper.readTree(resp.body())) else None
    } catch { case NonFatal(_) => None }

  /** RFC 7662 introspection; Some(info) only when `active` (oauth.py:
    * 141-161, 189-195). */
  def introspect(token: String): Option[JsonNode] =
    config.introspectionUrl.flatMap { url =>
      try {
        val (fields, auth) = config.clientSecret match {
          case Some(sec) => (Seq("token" -> token), Some((config.clientId, sec)))
          case None      => (Seq("token" -> token, "client_id" -> config.clientId), None)
        }
        val resp = formPost(url, fields, auth)
        if (resp.statusCode() != 200) None
        else Some(mapper.readTree(resp.body()))
          .filter(n => Option(n.get("active")).exists(_.asBoolean(false)))
      } catch { case NonFatal(_) => None }
    }

  // ---- identity resolution (oauth.py:163-208 + validate) ------------------

  private def identityOf(userinfo: JsonNode): String =
    Option(userinfo.get(config.identityClaim)).map(_.asText())
      .orElse(Option(userinfo.get("sub")).map(_.asText()))
      .getOrElse("unknown")

  /** Mint a session for a validated userinfo document; returns the
    * cookie UUID (oauth.py:300-320 callback session creation). */
  def createSession(userinfo: JsonNode): String = {
    val now = System.currentTimeMillis()
    sessions.entrySet().removeIf(e => e.getValue._3 < now)
    val uuid = java.util.UUID.randomUUID().toString
    sessions.put(uuid, (identityOf(userinfo), userinfo, now + config.sessionTimeoutMillis))
    uuid
  }

  /** Live session's identity for a cookie UUID. */
  def sessionIdentity(uuid: String): Option[String] =
    sessionEntry(uuid).map(_._1)

  /** Live session's userinfo document (the /auth/userinfo route). */
  def sessionUserinfo(uuid: String): Option[JsonNode] =
    sessionEntry(uuid).map(_._2)

  private def sessionEntry(uuid: String): Option[(String, JsonNode, Long)] =
    Option(sessions.get(uuid)).flatMap { e =>
      if (System.currentTimeMillis() <= e._3) Some(e)
      else { sessions.remove(uuid); None }
    }

  def dropSession(uuid: String): Unit = sessions.remove(uuid)

  /** Resolve a request's OAuth identity: session cookie first, then a
    * Bearer token validated via introspection-or-userinfo
    * (get_identity_from_credentials, oauth.py:163-208). A valid
    * bearer mints no session — each request re-validates, matching
    * the reference's per-request dependency path.
    */
  def identityFrom(cookieValue: Option[String],
      authorizationHeader: Option[String]): Option[String] = {
    val fromCookie = cookieValue.flatMap(sessionIdentity)
    fromCookie.orElse {
      authorizationHeader
        .filter(_.toLowerCase(java.util.Locale.ROOT).startsWith("bearer "))
        .map(_.drop(7).trim)
        .flatMap { token =>
          val info =
            if (config.introspectionUrl.isDefined) introspect(token)
            else fetchUserinfo(token)
          info.map(identityOf)
        }
    }
  }

  /** Userinfo for bookkeeping routes when authenticated by bearer. */
  def userinfoFrom(authorizationHeader: Option[String]): Option[JsonNode] =
    authorizationHeader
      .filter(_.toLowerCase(java.util.Locale.ROOT).startsWith("bearer "))
      .map(_.drop(7).trim)
      .flatMap(fetchUserinfo)

  def cookieName: String = config.cookieName
  def sessionTimeoutMillis: Long = config.sessionTimeoutMillis
}
