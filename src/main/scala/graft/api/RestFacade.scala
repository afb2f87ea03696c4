package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.tsdb.TimeSeriesStore

/** REST ingest/query facade — the reference's example microservice surface
  * (reference: examples/wrap-it-into-microservice/service.js:22-54):
  *
  *  - `POST /set` with body `{tag: {sortKey: value}}` → bulk upsert;
  *    responds 200 with the store-size backpressure signal (the reference
  *    returns Redis used-memory bytes as a JSON string).
  *  - `POST /get` with body `{tag: {"start": s, "end": e}}` → scatter-gather
  *    range read; responds 200 with `{tag: {ts: value}}`.
  *  - validation failures → 500 with the reference's golden error message
  *    (service.js responds 500 on thrown errors).
  *
  * Values are stored as their JSON serialization (the reference
  * JSON.stringifies the payload, index.js:123) and parsed back on read —
  * so numbers, strings, and objects round-trip like the reference's
  * opaque-payload contract.
  *
  * JDK `com.sun.net.httpserver` + Jackson (both already on the Spark
  * classpath) — no new dependencies.
  */
final class RestFacade(store: TimeSeriesStore, port: Int = 0) {

  private val mapper = new ObjectMapper
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  /** Bound port (useful when constructed with port 0). */
  def boundPort: Int = server.getAddress.getPort

  private def handle(ex: HttpExchange)(body: JsonNode => JsonNode): Unit = {
    val (status, payload) =
      try {
        if (ex.getRequestMethod != "POST")
          (405, JsonNodeFactory.instance.textNode("POST only"))
        else {
          val in = mapper.readTree(ex.getRequestBody)
          (200, body(in))
        }
      } catch {
        case e: Exception =>
          (500, JsonNodeFactory.instance.textNode(
            Option(e.getMessage).getOrElse(e.toString)))
      }
    val bytes = mapper.writeValueAsBytes(payload)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  server.createContext("/set", (ex: HttpExchange) => handle(ex) { in =>
    val batch = in.properties().asScala.map { e =>
      val tag = e.getKey
      val samples = e.getValue.properties().asScala.map { s =>
        s.getKey.toLong -> mapper.writeValueAsString(s.getValue)
      }.toMap
      tag -> samples
    }.toMap
    val bytes = store.write(batch)
    JsonNodeFactory.instance.textNode(bytes.toString) // service.js:35 shape
  })

  server.createContext("/get", (ex: HttpExchange) => handle(ex) { in =>
    val ranges = in.properties().asScala.map { e =>
      e.getKey -> (e.getValue.get("start").asLong(), e.getValue.get("end").asLong())
    }.toMap
    val result = store.readData(ranges)
    val out = JsonNodeFactory.instance.objectNode()
    result.foreach { case (tag, samples) =>
      val tagNode = out.putObject(tag)
      samples.foreach { case (ts, json) =>
        // explicit type arg: Jackson's generic `set` would otherwise infer
        // its return type from the expected type and miscast
        tagNode.set[JsonNode](ts.toString, mapper.readTree(json))
      }
    }
    out
  })

  def start(): RestFacade = { server.start(); this }

  def stop(): Unit = server.stop(0)
}
