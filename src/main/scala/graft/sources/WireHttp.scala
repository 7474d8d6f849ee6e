package graft.sources

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths, StandardCopyOption}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** The wire HTTP LISTENER — the last transport slice of the
  * reference's write surface (main/src/http/http_service.rs routes:
  * `/api/v1/write` line protocol :484, `/api/v1/opentsdb/write` :691,
  * `/api/v1/prom/write` :1259, `/api/v1/prom/read` :1149,
  * `/api/v1/es/_bulk` :1524 — which also carries Loki-protobuf bodies
  * via content-type dispatch :2806 — and `/api/v1/traces` :1673,
  * plus `/api/v1/ping` :305). Loopback-only, JDK built-in HttpServer —
  * no network dependency, no added jars.
  *
  * Design: the listener is a DUMB SPOOL. Write routes append the raw
  * POST body to `<spool>/<route-key>/body-NNNNNN.bin` (write-aside +
  * atomic rename, so a concurrent Spark reader never sees a
  * half-written blob) and do ZERO parsing on the listener thread —
  * decoding happens where it scales, as the existing narrow-flatMap
  * decoders ([[LineProtocol]], [[OpenTsdb]], [[JsonLog]],
  * [[PromRemote]], [[LokiPush]], [[OtlpTrace]]) over a
  * `binaryFile`-format scan of the spool (batch) or a file stream
  * (Structured Streaming micro-batches). That is the 100 TB shape: N
  * ingest listeners spool to shared storage; executors decode.
  * `/api/v1/prom/read` is the one compute route: it decodes the
  * ReadRequest INLINE (bounded — matchers + bounds, a few hundred
  * bytes) and delegates to the caller's serve function, which runs
  * [[PromRemote.executeRead]]'s pushdown-translated Spark plan.
  */
final class WireHttp private (server: HttpServer, val spoolDir: String,
                              /** Cumulative per-route wire counters backing the
                                * reference's usage_schema http metrics tables
                                * (http_data_in / http_writes / http_queries /
                                * http_data_out). Updated by the handlers; a few
                                * AtomicLongs, no request-path allocation beyond
                                * the counter bump. */
                              val metrics: WireHttp.Metrics) {
  def port: Int = server.getAddress.getPort
  def base: String = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)
}

object WireHttp {

  final class Metrics {
    import java.util.concurrent.atomic.AtomicLong
    import java.util.concurrent.ConcurrentHashMap
    // keyed per (api, tenant, user) — the reference tags its
    // usage_schema http series with tenant/user, so multi-tenant
    // traffic stays attributable (http_metrics.slt's column set)
    private val bytesIn = new ConcurrentHashMap[(String, String, String), AtomicLong]()
    private val writes = new ConcurrentHashMap[(String, String, String), AtomicLong]()
    val queries = new AtomicLong()
    val dataOut = new AtomicLong()
    private def bump(m: ConcurrentHashMap[(String, String, String), AtomicLong],
                     k: (String, String, String), v: Long): Unit =
      m.computeIfAbsent(k, _ => new AtomicLong()).addAndGet(v)
    private[sources] def recordWrite(api: String, tenant: String, user: String,
                                     bodyBytes: Long): Unit = {
      bump(writes, (api, tenant, user), 1L); bump(bytesIn, (api, tenant, user), bodyBytes)
    }
    private[sources] def recordQueryIn(tenant: String, user: String,
                                       bodyBytes: Long): Unit = {
      queries.incrementAndGet(); bump(bytesIn, ("/api/v1/sql", tenant, user), bodyBytes)
    }
    private[sources] def recordQueryOut(outBytes: Long): Unit =
      dataOut.addAndGet(outBytes)
    import scala.jdk.CollectionConverters._
    def dataInRows: Seq[(String, String, String, Long)] =
      bytesIn.asScala.toSeq.map { case ((a, t, u), v) => (a, t, u, v.get) }
        .sortBy(r => (r._1, r._2, r._3))
    def writeRows: Seq[(String, String, String, Long)] =
      writes.asScala.toSeq.map { case ((a, t, u), v) => (a, t, u, v.get) }
        .sortBy(r => (r._1, r._2, r._3))
  }

  /** route path → spool subdirectory (route keys mirror the reference's
    * write families).
    */
  val writeRoutes: Map[String, String] = Map(
    "/api/v1/write" -> "lp",
    "/api/v1/opentsdb/write" -> "opentsdb",
    "/api/v1/prom/write" -> "prom",
    "/api/v1/es/_bulk" -> "log",
    "/api/v1/traces" -> "otlp")

  private def handler(f: HttpExchange => Unit): HttpHandler = new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try f(ex)
      catch {
        case e: Throwable =>
          // the reference's write routes answer parse errors with 4xx
          // (http_service.rs error replies); a poison body must not
          // kill the listener
          val msg = ("parse error: " + Option(e.getMessage).getOrElse(e.getClass.getName))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          ex.sendResponseHeaders(400, msg.length)
          ex.getResponseBody.write(msg)
          ex.close()
      }
  }

  /** Start a loopback listener on an ephemeral port. `promRead`, when
    * given, serves `/api/v1/prom/read` (decoded queries in, snappy
    * ReadResponse bytes out). `sqlExec`, when given, serves
    * `/api/v1/sql` — the reference's authenticated query route
    * (http_service.rs:324): basic-auth credentials + `tenant`/`db`
    * query params + the POST body's SQL go to the callback
    * ((user, password, tenant, db, sql) → Right(CSV) or
    * Left(status → message)); typically
    * [[graft.admin.AdminEngine.execHttp]], which maps auth failures to
    * 401, privilege denials to 403, missing objects to 404, and
    * planner rejections to 422.
    */
  def start(spoolDir: String,
            promRead: Seq[PromRemote.ReadQuery] => Array[Byte] = null,
            sqlExec: (String, String, String, String, String) => Either[(Int, String), String] = null,
            writeAuth: (String, String, String, String) => Either[(Int, String), Unit] = null): WireHttp = {
    val srv = HttpServer.create(
      new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, 0), 0)
    val metrics = new Metrics
    writeRoutes.foreach { case (route, sub) =>
      val dir = Paths.get(spoolDir, sub)
      Files.createDirectories(dir)
      val seq = new java.util.concurrent.atomic.AtomicLong()
      srv.createContext(route, handler { ex =>
        require(ex.getRequestMethod == "POST", s"$route accepts POST")
        // tenant/db ride query params (the reference's WriteParam) or
        // headers; credentials ride basic auth. When an authenticator
        // is wired (http_service.rs authenticates EVERY write route),
        // a rejected request is answered WITHOUT reading the body into
        // the spool and without bumping the write counters.
        val params = queryParams(ex)
        def hdr(k: String): Option[String] = Option(ex.getRequestHeaders.getFirst(k))
        val tenant = params.get("tenant").orElse(hdr("tenant")).getOrElse("cnosdb")
        val db = params.get("db").orElse(hdr("db")).getOrElse("public")
        val (user, password) = basicAuth(ex)
        val denial =
          if (writeAuth == null) None
          else writeAuth(user, password, tenant, db).left.toOption
        denial match {
          case Some((code, msg)) =>
            // drain-and-discard the body (bounded chunks, nothing
            // retained): responding while the client is mid-write
            // resets the connection before it can read the status. The
            // spool is never touched on a denial.
            val in = ex.getRequestBody
            val sink = new Array[Byte](64 << 10)
            while (in.read(sink) >= 0) ()
            val bytes = msg.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            ex.sendResponseHeaders(code, bytes.length)
            ex.getResponseBody.write(bytes)
            ex.close()
          case None =>
            val body = ex.getRequestBody.readAllBytes()
            metrics.recordWrite(route, tenant, user, body.length.toLong)
            val n = seq.incrementAndGet()
            val tmp = dir.resolve(s".in-$n.tmp")
            Files.write(tmp, body)
            Files.move(tmp, dir.resolve(f"body-$n%06d.bin"),
              StandardCopyOption.ATOMIC_MOVE)
            ex.sendResponseHeaders(204, -1)
            ex.close()
        }
      })
    }
    srv.createContext("/api/v1/ping", handler { ex =>
      val body = """{"version":"graft"}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    if (promRead != null)
      srv.createContext("/api/v1/prom/read", handler { ex =>
        val queries = PromRemote.parseReadRequest(ex.getRequestBody.readAllBytes())
        val resp = promRead(queries)
        ex.getResponseHeaders.add("Content-Type", "application/x-protobuf")
        ex.getResponseHeaders.add("Content-Encoding", "snappy")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
        ex.close()
      })
    if (sqlExec != null)
      srv.createContext("/api/v1/sql", handler { ex =>
        require(ex.getRequestMethod == "POST", "/api/v1/sql accepts POST")
        val (user, password) = basicAuth(ex)
        val params = queryParams(ex)
        val tenant = params.getOrElse("tenant", "cnosdb")
        val db = params.getOrElse("db", "public")
        val sqlBytes = ex.getRequestBody.readAllBytes()
        val sql = new String(sqlBytes, java.nio.charset.StandardCharsets.UTF_8)
        // wire BYTES in, counted for every request — failed queries are
        // traffic too (they still consumed the wire and the planner)
        metrics.recordQueryIn(tenant, user, sqlBytes.length.toLong)
        sqlExec(user, password, tenant, db, sql) match {
          case Right(csv) =>
            val bytes = csv.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            metrics.recordQueryOut(bytes.length.toLong)
            ex.getResponseHeaders.add("Content-Type", "text/csv")
            if (bytes.isEmpty) ex.sendResponseHeaders(200, -1)
            else { ex.sendResponseHeaders(200, bytes.length); ex.getResponseBody.write(bytes) }
            ex.close()
          case Left((code, msg)) =>
            val bytes = msg.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            ex.sendResponseHeaders(code, bytes.length)
            ex.getResponseBody.write(bytes)
            ex.close()
        }
      })
    srv.start()
    new WireHttp(srv, spoolDir, metrics)
  }

  /** Decode an `Authorization: Basic` header to (user, password);
    * ("", "") when absent/malformed so the auth callback rejects it. */
  private def basicAuth(ex: HttpExchange): (String, String) = {
    val h = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
    if (!h.startsWith("Basic ")) ("", "")
    else try {
      val dec = new String(java.util.Base64.getDecoder.decode(h.stripPrefix("Basic ").trim),
        java.nio.charset.StandardCharsets.UTF_8)
      dec.split(":", 2) match {
        case Array(u, p) => (u, p)
        case Array(u)    => (u, "")
      }
    } catch { case _: IllegalArgumentException => ("", "") }
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&").toSeq
      .filter(_.nonEmpty).flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
          case _           => None
        }
      }.toMap

  /** Client half for lanes/specs: POST `body` to `url`, return
    * (status, response bytes).
    */
  def post(url: String, body: Array[Byte],
           contentType: String = "application/x-protobuf",
           basicAuth: (String, String) = null): (Int, Array[Byte]) = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", contentType)
    if (basicAuth != null)
      conn.setRequestProperty("Authorization", "Basic " + java.util.Base64.getEncoder
        .encodeToString(s"${basicAuth._1}:${basicAuth._2}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    conn.getOutputStream.write(body)
    conn.getOutputStream.close()
    val code = conn.getResponseCode
    val in = if (code < 400) conn.getInputStream else conn.getErrorStream
    val bytes = if (in == null) Array.emptyByteArray else in.readAllBytes()
    conn.disconnect()
    (code, bytes)
  }
}
