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
      val main = root.path("main")
      Array[Any](
        station,
        UTF8String.fromString(root.path("name").asText(city)),
        main.path("temp").asDouble,
        main.path("feels_like").asDouble,
        main.path("temp_min").asDouble,
        main.path("temp_max").asDouble,
        main.path("pressure").asLong,
        main.path("humidity").asLong,
        root.path("visibility").asLong,
        root.path("wind").path("speed").asDouble,
        root.path("wind").path("deg").asDouble,
        root.path("clouds").path("all").asLong,
        root.path("dt").asLong,
        root.path("sys").path("sunrise").asLong,
        root.path("sys").path("sunset").asLong)
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
