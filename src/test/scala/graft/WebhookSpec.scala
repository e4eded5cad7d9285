package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.notifications.Notifications._

/** Real webhook egress through the injectable transport: a loopback
 *  HTTP server receives the POST, so the body/header contract and the
 *  status-code → boolean mapping are pinned without network egress. */
class WebhookSpec extends AnyFunSuite {

  private def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))

  private def withServer(status: Int)(
      f: (String, () => Seq[(String, String)]) => Unit): Unit = {
    val received =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        received.add((ex.getRequestHeaders.getFirst("Content-Type"), body))
        ex.sendResponseHeaders(status, -1)
        ex.close()
      })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/hook",
      () => { import scala.jdk.CollectionConverters._
        received.asScala.toSeq })
    finally server.stop(0)
  }

  test("JdkWebhookTransport POSTs the payload JSON; 200 → true") {
    withServer(200) { (url, got) =>
      val sink = new WebhookSink(url, new JdkWebhookTransport())
      val ok = sink.send("Anomaly Alert: orders",
        "event=anomaly_detected\nconnection=c1",
        GraftEvent("anomaly", "anomaly_detected", "c1", Some("orders"),
          Map("high_severity_count" -> "2", "a_key" -> "v\"q"),
          ts("2026-01-01T00:00:00Z")))
      assert(ok)
      val posts = got()
      assert(posts.size == 1)
      val (ctype, body) = posts.head
      assert(ctype == "application/json")
      assert(body.contains("\"subject\": \"Anomaly Alert: orders\""))
      assert(body.contains("\"event_type\": \"anomaly\""))
      assert(body.contains("\"table_name\": \"orders\""))
      // data keys sorted, values escaped
      assert(body.indexOf("\"a_key\": \"v\\\"q\"") <
        body.indexOf("\"high_severity_count\": \"2\""))
      assert(body.contains("\"ts\": \"2026-01-01T00:00:00Z\""))
    }
  }

  test("non-2xx response → send false; publisher downgrades, still stores") {
    withServer(500) { (url, got) =>
      val sink = new WebhookSink(url, new JdkWebhookTransport())
      assert(!sink.send("s", "m",
        GraftEvent("automation", "automation_job_failed", "c", None,
          Map.empty, ts("2026-01-01T00:00:00Z"))))
      assert(got().size == 1)
    }
  }

  test("connection-refused surfaces as an exception (publisher catches)") {
    // a port that is not listening: bind then close to reserve nothing
    val sock = new java.net.ServerSocket(0)
    val deadPort = sock.getLocalPort
    sock.close()
    val sink = new WebhookSink(s"http://127.0.0.1:$deadPort/hook",
      new JdkWebhookTransport(timeoutMillis = 500))
    intercept[Exception] {
      sink.send("s", "m", GraftEvent("automation", "x", "c", None,
        Map.empty, ts("2026-01-01T00:00:00Z")))
    }
    // the tableName=None lane of the payload is still well-formed
    assert(sink.posted.size == 1)
  }

  test("default transport stays zero-egress and records payloads") {
    val sink = new WebhookSink()
    assert(sink.send("s", "m", GraftEvent("anomaly", "anomaly_detected",
      "c", None, Map.empty, ts("2026-01-01T00:00:00Z"))))
    assert(sink.posted.size == 1)
    assert(sink.payloadJson("s", "m", sink.posted.head._2)
      .contains("\"table_name\": null"))
  }
}
