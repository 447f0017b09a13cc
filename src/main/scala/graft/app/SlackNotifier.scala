package graft.app

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

/** Slack webhook delivery (write_message_to_slack / write_slack_error,
  * nci-seronet-data-validator.py:208-213, 237-250): POST the summary as
  * `{"type": "mrkdwn", "text": <message>}` with
  * `Content-Type: application/json`, routed to the FAILURE channel unless
  * the submission had zero errors (then the success channel) — the
  * reference's channel-selection rule verbatim.
  *
  * The webhook URLs are injected, never configured here: the spec drives
  * a 127.0.0.1 loopback server (zero egress), production wires the real
  * webhooks. Synchronous fire-and-report — the reference neither retries
  * nor batches, and at scale notification volume is per-submission
  * (driver-side metadata cardinality), so there is nothing to
  * distribute.
  */
object SlackNotifier {

  /** Route and send a formatted summary; returns the HTTP status. */
  def postSummary(summary: SummaryFormatter.Summary,
      successUrl: String, failureUrl: String): Int =
    post(if (summary.isFailure) failureUrl else successUrl, summary.text)

  /** POST one mrkdwn message to `url`; returns the HTTP status. */
  def post(url: String, text: String): Int = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(payload(text), UTF_8))
      .build()
    HttpClient.newHttpClient()
      .send(req, HttpResponse.BodyHandlers.ofString())
      .statusCode()
  }

  /** The reference's exact body shape: json.dumps({"type": "mrkdwn",
    * "text": ...}) — keys in insertion order, minimal string escaping.
    */
  def payload(text: String): String =
    s"""{"type": "mrkdwn", "text": "${escape(text)}"}"""

  private def escape(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case '\n'          => "\\n"
      case '\r'          => "\\r"
      case '\t'          => "\\t"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }
}
