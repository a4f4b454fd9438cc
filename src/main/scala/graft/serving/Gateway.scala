package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.functions.TimeCryptoProof
import graft.state.Snapshot

/** Minimal HTTP serving layer over the engine's state views — the
  * data-plane of the reference's gateway (core/.../actor/GatewayHttp.scala,
  * Partition.scala:155-192 KeyValueMediator) without the actor system:
  *
  *   - `GET /kv/{key}`              point read from a [[Snapshot]] (J8/P1)
  *   - `GET /stats`                 key count (P10 over the snapshot)
  *   - `GET /watch/{key}?from=N`    buffered CDC feed for one key (R7/R8) —
  *     the WebSocket push flattened to poll-the-buffer transport; a
  *     streaming query's `foreachBatch` appends into the [[ChangeFeed]]
  *   - optional signed-URL auth: with a salt configured, every request must
  *     carry `?signature=` valid for its PATH within the ±1-minute window
  *     (§2.6h, exactly the reference's TimeCryptoProof gateway check;
  *     clock injectable so specs are deterministic)
  *
  * Scale contract: this serves SNAPSHOT-sized (global/dimension) stores and
  * bounded change buffers — the reference's gateway likewise serves its
  * local memstore, not a fact scan. Fact-table point reads belong to
  * `KVTable.get` (predicate pushdown), not a web tier. JDK-only
  * (`com.sun.net.httpserver`), zero new dependencies. */
final class ChangeFeed(keepLastN: Int = 256, maxKeys: Int = 65536) {
  // LinkedHashMap: insertion order backs the key-eviction bound below
  private val buf = mutable.LinkedHashMap.empty[String, mutable.ArrayDeque[(Long, String)]]
  private var seq = 0L

  def append(key: String, valueJson: String): Long = synchronized {
    seq += 1
    val q = buf.getOrElseUpdate(key, mutable.ArrayDeque.empty)
    q.append((seq, valueJson))
    if (q.length > keepLastN) q.removeHead() // R8 keep-last-N bound per key
    // bound the KEY map too — without this, streaming over an unbounded
    // key space grows the buffer map forever; oldest-subscribed key goes
    if (buf.size > maxKeys) buf.remove(buf.head._1)
    seq
  }

  def since(key: String, fromSeq: Long): Seq[(Long, String)] = synchronized {
    buf.get(key).fold(Seq.empty[(Long, String)])(_.filter(_._1 > fromSeq).toSeq)
  }
}

final class Gateway(
    snapshot: Snapshot,
    feed: ChangeFeed = new ChangeFeed(),
    saltHex: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis() / 1000L) {

  private val mapper = new ObjectMapper
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

  def port: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val out = ex.getResponseBody
    try out.write(bytes) finally out.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).fold(Map.empty[String, String]) { q =>
      q.split('&').toSeq.flatMap { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
          case _ => None
        }
      }.toMap
    }

  /** The reference's gateway auth: signature valid for the request PATH in
    * the current minute window ± 1 (TimeCryptoProof.verify). */
  private def authorized(ex: HttpExchange): Boolean = saltHex.forall { salt =>
    queryParams(ex).get("signature")
      .exists(sig => TimeCryptoProof.verify(sig, ex.getRequestURI.getPath, salt, clock()))
  }

  private def rowJson(row: org.apache.spark.sql.Row): String = {
    val node = mapper.createObjectNode()
    row.schema.fieldNames.zipWithIndex.foreach { case (f, i) =>
      row.get(i) match {
        case null => node.putNull(f)
        case l: Long => node.put(f, l)
        case n: Int => node.put(f, n)
        case d: Double => node.put(f, d)
        case b: Boolean => node.put(f, b)
        case other => node.put(f, other.toString)
      }
    }
    mapper.writeValueAsString(node)
  }

  /** Coerce URL path segments (strings) to the snapshot's key types.
    * Returns None when a segment cannot be a value of its key type (or the
    * type is one a URL path cannot address) — the caller answers 404, a
    * miss, never a 500. */
  private def coerceKey(segments: Seq[String]): Option[Seq[Any]] = {
    import org.apache.spark.sql.types._
    try Some(segments.zip(snapshot.keyTypes).map {
      case (s, LongType) => s.toLong
      case (s, IntegerType) => s.toInt
      case (s, ShortType) => s.toShort
      case (s, ByteType) => s.toByte
      case (s, DoubleType) => s.toDouble
      case (s, FloatType) => s.toFloat
      case (s, BooleanType) => s.toBoolean
      case (s, StringType) => s
      case (_, other) =>
        throw new IllegalArgumentException(s"unaddressable key type $other")
    })
    catch { case _: IllegalArgumentException => None } // incl. NumberFormat
  }

  private def handle(ex: HttpExchange): Unit =
    try {
      if (!authorized(ex)) respond(ex, 401, """{"error":"invalid or expired signature"}""")
      else {
        val path = ex.getRequestURI.getPath
        path.split("/").filter(_.nonEmpty).toSeq match {
          case Seq("stats") =>
            respond(ex, 200, s"""{"num_keys":${snapshot.size}}""")
          case "kv" +: key if key.length == snapshot.keyCols.length =>
            coerceKey(key).flatMap(snapshot.get) match {
              case Some(row) => respond(ex, 200, rowJson(row))
              case None => respond(ex, 404, """{"error":"not found"}""")
            }
          case Seq("watch", key) =>
            val from = queryParams(ex).get("from").map(_.toLong).getOrElse(0L)
            val changes = feed.since(key, from)
              .map { case (s, v) => s"""{"seq":$s,"value":$v}""" }
            respond(ex, 200, changes.mkString("[", ",", "]"))
          case _ => respond(ex, 404, """{"error":"unknown route"}""")
        }
      }
    } catch {
      case e: Exception => respond(ex, 500, s"""{"error":"${e.getClass.getSimpleName}"}""")
    }

  def start(): Gateway = {
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null) // current thread of the default dispatcher
    server.start()
    this
  }

  def stop(): Unit = server.stop(0)
}
