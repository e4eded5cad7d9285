package graft.notifications

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Notification/event layer (reference: core/notifications/publisher.py,
 * core/automation/events.py) — the piece that turns a stored failure
 * into an alert. The reference publishes events from anomaly scans,
 * validation failures and automation runs, stores every event, and
 * fans the notification-worthy ones out to per-org channels (email /
 * Slack / webhook) gated by notification settings.
 *
 * Spark-native shape: every published event is appended to a
 * date-partitioned parquet [[EventStore]] (the durable event feed), and
 * notification-worthy events additionally fan out to pluggable
 * [[EventSink]]s. Channel delivery is driver-side (an alert is one
 * small record, never a data-plane job); the heavy part — deciding WHAT
 * to alert on — already ran on the cluster.
 */
object Notifications {

  /** One published event (events.py:63-71 payload shape, flattened). */
  final case class GraftEvent(
      eventType: String, // anomaly | automation | validation
      subtype: String, // e.g. anomaly_detected, schema_changes_detected
      connectionId: String,
      tableName: Option[String],
      data: Map[String, String],
      ts: Timestamp)

  /** Per-deployment notification preferences
   *  (publisher.py:70-90 `_get_notification_settings` keys). */
  final case class NotificationSettings(
      emailEnabled: Boolean = false,
      slackEnabled: Boolean = false,
      webhookEnabled: Boolean = false,
      notifyHighSeverity: Boolean = true,
      notifyMediumSeverity: Boolean = true,
      notifyLowSeverity: Boolean = false,
      automationNotificationsEnabled: Boolean = true)

  /** A delivery channel. Implementations must be cheap and non-throwing
   *  (a failing channel must never fail the producing scan — the
   *  reference logs and returns False, publisher.py:46-49). */
  trait EventSink {
    def name: String
    def send(subject: String, message: String, event: GraftEvent): Boolean
  }

  /** Log-only channel (always available). */
  final class LogSink extends EventSink {
    val name = "log"
    def send(subject: String, message: String, event: GraftEvent): Boolean = {
      System.err.println(s"[notify] $subject — ${event.subtype}")
      true
    }
  }

  /** The webhook channel's HTTP boundary — INJECTABLE, so the sink's
   *  routing/payload logic is testable without egress and a deployment
   *  plugs in the real client. */
  trait WebhookTransport extends Serializable {
    /** POST JSON `body` to `url` with `headers`; returns the HTTP
     *  status code (throw on connection failure — the publisher's
     *  per-sink catch downgrades it to a logged false). */
    def post(url: String, body: String, headers: Map[String, String]): Int
  }

  /** Zero-egress default (the sandbox stance): accept and discard.
   *  The sink still records every payload for contract tests. */
  object NoopWebhookTransport extends WebhookTransport {
    def post(url: String, body: String,
        headers: Map[String, String]): Int = 200
  }

  /** REAL transport: JDK HttpClient POST of the payload JSON — the
   *  reference's webhook delivery (publisher.py:24-49
   *  `_send_webhook_notification`, requests.post(url, json=payload)).
   *  Bounded timeouts on connect and request; never retries (the
   *  publisher's contract is one attempt per event per channel). */
  final class JdkWebhookTransport(timeoutMillis: Long = 5000L)
      extends WebhookTransport {
    @transient private lazy val client = java.net.http.HttpClient
      .newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMillis))
      .build()
    def post(url: String, body: String,
        headers: Map[String, String]): Int = {
      val b = java.net.http.HttpRequest
        .newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMillis))
        .POST(java.net.http.HttpRequest.BodyPublishers
          .ofString(body, java.nio.charset.StandardCharsets.UTF_8))
      headers.foreach { case (k, v) => b.header(k, v) }
      client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
    }
  }

  /** Webhook channel: POSTs each selected event's payload JSON to
   *  `url` through the injected transport. Default transport is the
   *  zero-egress recorder (this container cannot reach the network);
   *  wire [[JdkWebhookTransport]] for real delivery. `posted` keeps
   *  the exact payloads for contract tests either way. */
  final class WebhookSink(
      val url: String = "http://localhost/webhook",
      transport: WebhookTransport = NoopWebhookTransport)
      extends EventSink {
    val name = "webhook"
    private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, GraftEvent)]
    def posted: Seq[(String, GraftEvent)] = buf.toSeq

    private def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    /** Deterministic payload JSON (publisher.py's payload shape,
     *  flattened): data keys sorted so the bytes are reproducible. */
    private[graft] def payloadJson(
        subject: String, message: String, e: GraftEvent): String = {
      val data = e.data.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }
        .mkString("{", ", ", "}")
      Seq(
        s"${jstr("subject")}: ${jstr(subject)}",
        s"${jstr("message")}: ${jstr(message)}",
        s"${jstr("event_type")}: ${jstr(e.eventType)}",
        s"${jstr("subtype")}: ${jstr(e.subtype)}",
        s"${jstr("connection_id")}: ${jstr(e.connectionId)}",
        s"${jstr("table_name")}: " +
          e.tableName.map(jstr).getOrElse("null"),
        s"${jstr("data")}: $data",
        s"${jstr("ts")}: ${jstr(e.ts.toInstant.toString)}")
        .mkString("{", ", ", "}")
    }

    def send(subject: String, message: String, event: GraftEvent): Boolean = {
      buf += ((subject, event))
      val code = transport.post(url, payloadJson(subject, message, event),
        Map("Content-Type" -> "application/json"))
      code >= 200 && code < 300
    }
  }

  /** Automation subtypes worth alerting on (publisher.py:175-180). */
  val ImportantAutomationEvents: Set[String] = Set(
    "automation_job_failed",
    "schema_changes_detected",
    "validation_failures_detected")

  /**
   * The publisher: stores EVERY event, notifies for the subset the
   * settings + routing rules select (publisher.py:24-49):
   *  - `anomaly`/`anomaly_detected`: notify if any present severity
   *    level is enabled (high/medium default on, low default off);
   *  - `automation`: notify only [[ImportantAutomationEvents]] and only
   *    when automation notifications are enabled;
   *  - anything else: stored, never notified.
   */
  final class NotificationPublisher(
      store: EventStore,
      settings: NotificationSettings = NotificationSettings(),
      sinks: Seq[EventSink] = Seq(new LogSink)) {

    def shouldNotify(event: GraftEvent): Boolean = event.eventType match {
      case "anomaly" if event.subtype == "anomaly_detected" =>
        def cnt(k: String) = event.data.get(k).flatMap(_.toLongOption).getOrElse(0L)
        (cnt("high_severity_count") > 0 && settings.notifyHighSeverity) ||
          (cnt("medium_severity_count") > 0 && settings.notifyMediumSeverity) ||
          (cnt("low_severity_count") > 0 && settings.notifyLowSeverity)
      case "automation" =>
        settings.automationNotificationsEnabled &&
          ImportantAutomationEvents.contains(event.subtype)
      case _ => false
    }

    /** Batch publish: ONE store write for the whole batch, then the
     *  same per-event notification fan-out as [[publish]]. Returns
     *  whether every notified event's channels all accepted. */
    def publishAll(events: Seq[GraftEvent]): Boolean = {
      if (events.isEmpty) return true
      store.appendAll(events)
      events.forall(e => !shouldNotify(e) || fanOut(e))
    }

    /** Publish: persist, then fan out if notification-worthy. Returns
     *  whether every selected channel accepted (reference semantics:
     *  a filtered-out event is still a successful publish). */
    def publish(event: GraftEvent): Boolean = {
      store.append(event)
      if (!shouldNotify(event)) true
      else fanOut(event)
    }

    private def fanOut(event: GraftEvent): Boolean = {
      val subject = subjectFor(event)
      val message = messageFor(event)
      sinks.forall { s =>
        try s.send(subject, message, event)
        catch {
          case e: Exception =>
            System.err.println(s"[notify] ${s.name} failed: ${e.getMessage}")
            false
        }
      }
    }

    /** publisher.py:98 `f"🚨 Anomaly Alert: {table_name}"` et al. */
    private def subjectFor(e: GraftEvent): String = e.subtype match {
      case "anomaly_detected" =>
        s"Anomaly Alert: ${e.tableName.getOrElse("Unknown")}"
      case "schema_changes_detected" =>
        s"Schema Changes: ${e.tableName.getOrElse(e.connectionId)}"
      case "validation_failures_detected" =>
        s"Validation Failures: ${e.tableName.getOrElse("Unknown")}"
      case other => s"Automation: $other"
    }

    private def messageFor(e: GraftEvent): String =
      (Seq(s"event=${e.subtype}", s"connection=${e.connectionId}") ++
        e.tableName.map(t => s"table=$t") ++
        e.data.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" })
        .mkString("\n")
  }
}

/** Durable event feed: date-partitioned parquet append, one row per
 *  published event (the reference's `automation_events` table,
 *  events.py:147-186 `_store_automation_event`). `data` is flattened to
 *  a deterministic JSON-ish string so the feed is queryable without a
 *  map type. */
final class EventStore(spark: SparkSession, path: String) {
  import graft.notifications.Notifications.GraftEvent

  def append(e: GraftEvent): Unit = appendAll(Seq(e))

  /** Batch append: N events land in ONE parquet write (one committer
   *  round-trip instead of N) — the per-tick shape for producers like
   *  the ingest scheduler that emit an event per processed slice. */
  def appendAll(events: Seq[GraftEvent]): Unit = {
    if (events.isEmpty) return
    import spark.implicits._
    val rows = events.map { e =>
      val dataStr = e.data.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(";")
      (e.eventType, e.subtype, e.connectionId, e.tableName.orNull,
        dataStr, e.ts)
    }
    val row = rows
      .toDF("event_type", "subtype", "connection_id", "table_name",
        "data", "ts")
      .withColumn("date", to_date(col("ts")))
    graft.history.StoreIO.appendLocked(path) {
      // single-task driver-local append: one task, one file per
      // partition dir instead of one per row (guide §6, r19)
      row.coalesce(1).write.mode(SaveMode.Append)
        .partitionBy("date").parquet(path)
    }
  }

  /** The feed, newest first; empty-but-schema-correct before the first
   *  append so consumers work on a fresh install. */
  def feed(
      eventType: Option[String] = None,
      tableName: Option[String] = None): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val base =
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        spark.read.parquet(path)
      else {
        import spark.implicits._
        Seq.empty[(String, String, String, String, String, Timestamp)]
          .toDF("event_type", "subtype", "connection_id", "table_name",
            "data", "ts")
      }
    var df = base
    eventType.foreach(t => df = df.filter(col("event_type") === t))
    tableName.foreach(t => df = df.filter(col("table_name") === t))
    df.orderBy(col("ts").desc)
  }
}
