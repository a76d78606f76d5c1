package graft.sinks

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import java.nio.charset.StandardCharsets
import java.util.Base64

/** Elasticsearch upsert/delete sink — reference parity for R13/R14
  * (ElasticsearchUtils.java:101-189) with its two bugs fixed per SURVEY
  * §2.4.3–4: the bulk endpoint is `/_bulk` (reference misspells
  * `/_bluk`) and Basic auth encodes the RAW `user:pass` (reference
  * URL-encodes first, breaking passwords with reserved chars).
  *
  * Same request shapes as the reference: single record → `PUT
  * {url}/_doc/{id}` with the record body; multiple → `POST {url}/_bulk`
  * with NDJSON action/record lines; deletes mirror with DELETE /
  * `{"delete":...}` actions. Ids come from the record's `idKey` field —
  * id-keyed upserts are what make at-least-once delivery idempotent
  * (the exactly-once-effect story, SURVEY §2.3).
  *
  * Transport is injected so tests assert exact request payloads without
  * a live cluster; the default is java.net.http. Batches are built
  * per-partition (`foreachPartition`) — requests fan out from executors,
  * never through the driver.
  */
object EsSink {

  final case class Config(url: String, username: String, password: String,
      idKey: String, bulkSize: Int = 500) {
    require(url.nonEmpty && idKey.nonEmpty, "url and idKey are required")
  }

  final case class Request(method: String, url: String,
      headers: Map[String, String], body: String)

  trait Transport extends Serializable {
    def send(req: Request): Unit
  }

  /** Default transport: blocking java.net.http per executor. */
  final class HttpTransport extends Transport {
    @transient private lazy val client = java.net.http.HttpClient.newHttpClient()
    def send(req: Request): Unit = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(req.url))
        .method(req.method,
          java.net.http.HttpRequest.BodyPublishers.ofString(req.body))
      req.headers.foreach { case (k, v) => b.header(k, v) }
      client.send(b.build(), java.net.http.HttpResponse.BodyHandlers.discarding())
    }
  }

  /** Raw `user:pass` Base64 — NOT URL-encoded (reference bug 2.4.4). */
  def basicAuth(user: String, pass: String): String =
    "Basic " + Base64.getEncoder.encodeToString(
      s"$user:$pass".getBytes(StandardCharsets.UTF_8))

  private def headers(cfg: Config): Map[String, String] = Map(
    "Content-Type" -> "application/json",
    "Authorization" -> basicAuth(cfg.username, cfg.password))

  /** NDJSON bulk-upsert body for (id, recordJson) pairs. */
  def bulkUpsertBody(records: Seq[(String, String)]): String =
    records.map { case (id, json) =>
      s"""{"index":{"_id":"$id"}}""" + "\n" + json
    }.mkString("", "\n", "\n")

  /** NDJSON bulk-delete body for ids. */
  def bulkDeleteBody(ids: Seq[String]): String =
    ids.map(id => s"""{"delete":{"_id":"$id"}}""").mkString("", "\n", "\n")

  /** Requests for one batch of (id, recordJson): single → PUT _doc/{id},
    * multiple → chunked POST _bulk (mirrors the reference's single/bulk
    * split at ElasticsearchUtils.java:134-152).
    */
  def upsertRequests(cfg: Config, records: Seq[(String, String)]): Seq[Request] =
    records match {
      case Seq((id, json)) =>
        Seq(Request("PUT", s"${cfg.url}/_doc/$id", headers(cfg), json))
      case rs => rs.grouped(cfg.bulkSize).map(chunk =>
        Request("POST", s"${cfg.url}/_bulk", headers(cfg),
          bulkUpsertBody(chunk))).toSeq
    }

  def deleteRequests(cfg: Config, ids: Seq[String]): Seq[Request] =
    ids match {
      case Seq(id) =>
        Seq(Request("DELETE", s"${cfg.url}/_doc/$id", headers(cfg), ""))
      case is => is.grouped(cfg.bulkSize).map(chunk =>
        Request("POST", s"${cfg.url}/_bulk", headers(cfg),
          bulkDeleteBody(chunk))).toSeq
    }

  /** Upsert every row of `df`; the id is `cfg.idKey`'s value. */
  def upsert(df: DataFrame, cfg: Config, transport: Transport): Unit = {
    val pairs = df.select(
      col(cfg.idKey).cast("string").as("_id"),
      to_json(struct(df.columns.map(col): _*)).as("_json"))
    pairs.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      it.grouped(cfg.bulkSize).foreach { chunk =>
        val recs = chunk.map(r => (r.getString(0), r.getString(1))).toSeq
        upsertRequests(cfg, recs).foreach(transport.send)
      }
    }
  }

  /** Delete by id for every row of `df`. */
  def delete(df: DataFrame, cfg: Config, transport: Transport): Unit = {
    val ids = df.select(col(cfg.idKey).cast("string").as("_id"))
    ids.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      it.grouped(cfg.bulkSize).foreach { chunk =>
        deleteRequests(cfg, chunk.map(_.getString(0)).toSeq).foreach(transport.send)
      }
    }
  }
}
