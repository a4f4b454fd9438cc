package graft

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import graft.serde.{HttpSchemaRegistry, RegistryTransport}
import org.apache.avro.{Schema, SchemaNormalization}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Drives the Confluent-protocol registry client against an in-memory fake
  * server (no network in this container). Verifies protocol encoding,
  * id-stable idempotent registration, evolution via writer-schema lookup,
  * and that caching keeps the hot serde path off the wire. */
class HttpSchemaRegistrySpec extends SparkSpec {

  /** Minimal registry server: content-hashed ids, Confluent REST shapes. */
  private final class FakeServer extends RegistryTransport {
    private val mapper = new ObjectMapper
    private val byFp = mutable.Map.empty[Long, Int]
    private val byId = mutable.Map.empty[Int, String]
    private val versions = mutable.Map.empty[String, mutable.ArrayBuffer[Int]]
    var gets = 0
    var posts = 0

    private val RegisterPath = "^/subjects/([^/]+)/versions$".r
    private val IdPath = "^/schemas/ids/([0-9]+)$".r
    private val LatestPath = "^/subjects/([^/]+)/versions/latest$".r

    override def post(path: String, body: String): (Int, String) = {
      posts += 1
      path match {
        case RegisterPath(subject) =>
          val schemaJson = mapper.readTree(body).get("schema").asText()
          val parsed = new Schema.Parser().parse(schemaJson)
          val fp = SchemaNormalization.parsingFingerprint64(parsed)
          val id = byFp.getOrElseUpdate(fp, {
            val next = byFp.size + 1
            byId(next) = schemaJson
            next
          })
          val vs = versions.getOrElseUpdate(subject, mutable.ArrayBuffer.empty)
          if (!vs.contains(id)) vs += id
          (200, s"""{"id":$id}""")
        case _ => (404, """{"error_code":404}""")
      }
    }

    override def get(path: String): (Int, String) = {
      gets += 1
      path match {
        case IdPath(id) =>
          byId.get(id.toInt)
            .map(s => (200, mapper.writeValueAsString(
              mapper.createObjectNode().put("schema", s))))
            .getOrElse((404, """{"error_code":40403}"""))
        case LatestPath(subject) =>
          versions.get(subject).flatMap(_.lastOption).map { id =>
            val node = mapper.createObjectNode()
            node.put("subject", subject)
            node.put("version", versions(subject).size)
            node.put("id", id)
            node.put("schema", byId(id))
            (200, mapper.writeValueAsString(node))
          }.getOrElse((404, """{"error_code":40401}"""))
        case _ => (404, """{"error_code":404}""")
      }
    }
  }

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType)))

  "HttpSchemaRegistry" should "register idempotently and round-trip framed rows" in {
    val server = new FakeServer
    val reg = new HttpSchemaRegistry(server)
    val row = Row(7, "alice")
    val framed = reg.write(row, schema, "accounts")
    reg.read(framed) shouldBe row
    // same schema re-registered: same id, no extra wire call (fp-cached)
    val postsAfterFirst = server.posts
    reg.write(Row(8, "bob"), schema, "accounts")
    server.posts shouldBe postsAfterFirst
  }

  it should "resolve an unknown writer id over the wire exactly once" in {
    val server = new FakeServer
    val writerClient = new HttpSchemaRegistry(server)
    val framed = writerClient.write(Row(1, "x"), schema, "accounts")
    // a FRESH client (different executor) has a cold cache: one GET per id,
    // then cached for every subsequent row
    val reader = new HttpSchemaRegistry(server)
    val gets0 = server.gets
    reader.read(framed) shouldBe Row(1, "x")
    reader.read(framed) shouldBe Row(1, "x")
    server.gets shouldBe gets0 + 1
  }

  it should "serve latest(subject) and support reader-schema evolution" in {
    val server = new FakeServer
    val reg = new HttpSchemaRegistry(server)
    reg.write(Row(1, "a"), schema, "accounts")
    val evolved = StructType(schema.fields :+ StructField("tier", StringType))
    val framedV2 = reg.write(Row(2, "b", "gold"), evolved, "accounts")
    val (latestId, latestSchema) = reg.latest("accounts")
    latestId shouldBe 2
    latestSchema.getField("tier") should not be null
    // old reader (v1 schema) reads a v2 payload: extra field projected away
    reg.read(framedV2, Some(graft.serde.AvroBridge.toAvroSchema(schema))) shouldBe Row(2, "b")
  }

  it should "surface registry errors with status and body" in {
    val server = new FakeServer
    val reg = new HttpSchemaRegistry(server)
    val ex = intercept[java.io.IOException] {
      reg.schema(99)
    }
    ex.getMessage should include("HTTP 404")
  }
}
