package graft.sources

import java.net.{HttpURLConnection, URI}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.unsafe.types.UTF8String

/** HTTP fetch + JSON pluck for [[ObservationSource]]'s `endpoint` mode —
  * the production path of SURVEY.md §2 O-4 (reference:
  * dags/utils/api.py:24-34, which GETs
  * `.../weather?q={city},{country}&appid={key}&units=metric` per station
  * and plucks 15 fields from the OpenWeatherMap response).
  *
  * Runs INSIDE the partition reader, so the per-station GETs fan out
  * across executors (vs the reference's serial driver loop). Key
  * rotation is deterministic per station (`keys(station % n)`) instead
  * of the reference's `random.choice` — same load-spreading effect,
  * replayable partitions (a retried task re-issues the identical
  * request).
  */
object HttpObservations {
  private lazy val mapper = new ObjectMapper()

  /** GET one observation and map it onto the 15-field record of
    * [[ObservationSource.schema]] (same field order as the fixture
    * `fetch`). `tick` is passed through so replay harnesses can serve
    * distinct observations per micro-batch.
    */
  def fetch(endpoint: String, apiKeys: Seq[String], station: Long, tick: Long): Array[Any] = {
    val key = if (apiKeys.isEmpty) "" else apiKeys((station % apiKeys.size).toInt)
    val city = s"city_$station"
    val url = new URI(
      s"$endpoint?q=$city,XX&appid=$key&units=metric&tick=$tick").toURL
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    try {
      val code = conn.getResponseCode
      if (code != 200)
        throw new java.io.IOException(s"observation fetch failed: HTTP $code for $url")
      val root = mapper.readTree(conn.getInputStream)
      // required-field access: Jackson's path().asLong silently maps a
      // MISSING or malformed field to 0 — a schema-valid but corrupt
      // observation poisoning downstream aggregates. The reference's
      // dict plucking raises KeyError loudly (dags/utils/api.py:30-34);
      // mirror that contract.
      def req(parent: com.fasterxml.jackson.databind.JsonNode,
          name: String): com.fasterxml.jackson.databind.JsonNode = {
        val node = parent.path(name)
        if (node.isMissingNode || node.isNull)
          throw new java.io.IOException(
            s"observation fetch: field '$name' missing in response for $url")
        node
      }
      val main = req(root, "main")
      Array[Any](
        station,
        UTF8String.fromString(root.path("name").asText(city)),
        req(main, "temp").asDouble,
        req(main, "feels_like").asDouble,
        req(main, "temp_min").asDouble,
        req(main, "temp_max").asDouble,
        req(main, "pressure").asLong,
        req(main, "humidity").asLong,
        req(root, "visibility").asLong,
        req(req(root, "wind"), "speed").asDouble,
        req(req(root, "wind"), "deg").asDouble,
        req(req(root, "clouds"), "all").asLong,
        req(root, "dt").asLong,
        req(req(root, "sys"), "sunrise").asLong,
        req(req(root, "sys"), "sunset").asLong)
    } finally conn.disconnect()
  }

  /** OWM-shaped JSON for the fixture observation of (station, tick) —
    * used by test stub servers so endpoint mode can be verified against
    * fixture mode without egress. */
  def fixtureJson(station: Long, tick: Long): String = {
    val r = ObservationSource.fetch(station, tick)
    def node(pairs: (String, Any)*): String =
      pairs.map { case (k, v) => s""""$k":${render(v)}""" }.mkString("{", ",", "}")
    def render(v: Any): String = v match {
      case s: UTF8String => "\"" + s.toString + "\""
      case other => other.toString
    }
    node(
      "name" -> r(1),
      "main" -> new Raw(node("temp" -> r(2), "feels_like" -> r(3),
        "temp_min" -> r(4), "temp_max" -> r(5),
        "pressure" -> r(6), "humidity" -> r(7))),
      "visibility" -> r(8),
      "wind" -> new Raw(node("speed" -> r(9), "deg" -> r(10))),
      "clouds" -> new Raw(node("all" -> r(11))),
      "dt" -> r(12),
      "sys" -> new Raw(node("sunrise" -> r(13), "sunset" -> r(14))),
      "timezone" -> 0L)
  }

  private final class Raw(val json: String) { override def toString: String = json }
}
