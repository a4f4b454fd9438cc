package graft

import scala.collection.mutable

import graft.streaming.{TopicAdmin, TopicEnsure, TopicMeta, TopicSpec}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** S7 topic admin / auto-configuration, driven through an in-memory fake
  * broker admin (no Kafka in this container — the seam is the point; see
  * TopicAdmin scaladoc). Asserts the reference's decision logic:
  * create-when-absent, partition/replication verification, config-delta
  * computation, readonly-never-mutates, full-map (non-incremental) alter. */
class TopicAdminSpec extends AnyFlatSpec with Matchers {

  private class FakeAdmin extends TopicAdmin {
    val topics = mutable.Map.empty[String, TopicMeta]
    val configs = mutable.Map.empty[String, Map[String, String]]
    val alterCalls = mutable.Buffer.empty[(String, Map[String, String])]
    var createCalls = 0

    override def listTopics(): Set[String] = topics.keySet.toSet
    override def createTopic(topic: String, numPartitions: Int, rf: Int): Unit = {
      createCalls += 1
      topics(topic) = TopicMeta(numPartitions, rf)
      configs.getOrElseUpdate(topic, Map.empty)
    }
    override def describeTopic(topic: String): TopicMeta = topics(topic)
    override def describeConfigs(topic: String): Map[String, String] =
      configs.getOrElse(topic, Map.empty)
    override def alterConfigs(topic: String, cfg: Map[String, String]): Unit = {
      alterCalls += (topic -> cfg)
      configs(topic) = cfg
    }
  }

  "ensureExists (managed, compacted)" should "create the topic and converge its configs" in {
    val admin = new FakeAdmin
    val delta = TopicEnsure.ensureExists(admin,
      TopicSpec("state-changelog", partitions = Some(8), compacted = true))
    admin.createCalls shouldBe 1
    admin.topics("state-changelog") shouldBe TopicMeta(8, 1)
    // a fresh topic diverges on every desired key
    delta.keySet shouldBe TopicEnsure.desiredConfigs(0L).keySet
    admin.configs("state-changelog")(TopicEnsure.CleanupPolicy) shouldBe "compact"
    admin.configs("state-changelog")(TopicEnsure.RetentionMs) shouldBe Long.MaxValue.toString
  }

  it should "be idempotent: a converged topic yields an empty delta and no alter" in {
    val admin = new FakeAdmin
    TopicEnsure.ensureExists(admin, TopicSpec("t", Some(4), compacted = true))
    admin.alterCalls.clear()
    val delta = TopicEnsure.ensureExists(admin, TopicSpec("t", Some(4), compacted = true))
    delta shouldBe empty
    admin.alterCalls shouldBe empty
    admin.createCalls shouldBe 1
  }

  it should "set compact,delete plus ttl-bounded retention when a TTL is configured" in {
    val admin = new FakeAdmin
    TopicEnsure.ensureExists(admin,
      TopicSpec("ttl-log", Some(2), compacted = true, ttlMs = 86400000L))
    val cfg = admin.configs("ttl-log")
    cfg(TopicEnsure.CleanupPolicy) shouldBe "compact,delete"
    cfg(TopicEnsure.RetentionMs) shouldBe "86400000"
    cfg(TopicEnsure.MessageTimestampDiffMaxMs) shouldBe "86400000"
    cfg(TopicEnsure.RetentionBytes) shouldBe "-1"
  }

  "ensureCorrectConfiguration" should "alter only-diverged topics with the FULL merged config map" in {
    val admin = new FakeAdmin
    admin.topics("t") = TopicMeta(4, 1)
    // wrong policy, right retention, plus an unrelated custom entry that
    // the non-incremental alter API must carry through untouched
    admin.configs("t") = Map(
      TopicEnsure.CleanupPolicy -> "delete",
      TopicEnsure.MessageTimestampType -> "CreateTime",
      TopicEnsure.MessageTimestampDiffMaxMs -> Long.MaxValue.toString,
      TopicEnsure.RetentionMs -> Long.MaxValue.toString,
      TopicEnsure.RetentionBytes -> "-1",
      "min.insync.replicas" -> "2")
    val delta = TopicEnsure.ensureCorrectConfiguration(admin,
      TopicSpec("t", Some(4), compacted = true), readonly = false)
    delta shouldBe Map(TopicEnsure.CleanupPolicy -> "compact")
    admin.alterCalls should have size 1
    val shipped = admin.alterCalls.head._2
    shipped(TopicEnsure.CleanupPolicy) shouldBe "compact"
    shipped("min.insync.replicas") shouldBe "2" // untouched entry preserved
  }

  it should "never mutate an unmanaged topic (readonly): report the delta only" in {
    val admin = new FakeAdmin
    admin.topics("external") = TopicMeta(12, 3)
    admin.configs("external") = Map(TopicEnsure.CleanupPolicy -> "delete")
    val delta = TopicEnsure.ensureExists(admin,
      TopicSpec("external", partitions = None, compacted = true))
    delta(TopicEnsure.CleanupPolicy) shouldBe "compact"
    admin.alterCalls shouldBe empty
    admin.createCalls shouldBe 0
  }

  "createTopicIfNotExists" should "fail loudly on a partition-count mismatch" in {
    val admin = new FakeAdmin
    admin.topics("t") = TopicMeta(4, 1)
    an[IllegalStateException] should be thrownBy
      TopicEnsure.createTopicIfNotExists(admin, "t", numPartitions = 8, replicationFactor = 1)
  }

  it should "fail loudly when replication factor is below the requested one" in {
    val admin = new FakeAdmin
    admin.topics("t") = TopicMeta(4, 1)
    an[IllegalStateException] should be thrownBy
      TopicEnsure.createTopicIfNotExists(admin, "t", numPartitions = 4, replicationFactor = 3)
    // >= requested is acceptable (reference checks 'at least')
    admin.topics("t") = TopicMeta(4, 3)
    noException should be thrownBy
      TopicEnsure.createTopicIfNotExists(admin, "t", numPartitions = 4, replicationFactor = 2)
  }

  "ensureExists (managed, non-compacted)" should "create-and-verify without touching configs" in {
    val admin = new FakeAdmin
    val delta = TopicEnsure.ensureExists(admin,
      TopicSpec("plain-log", Some(6), compacted = false))
    delta shouldBe empty
    admin.topics("plain-log") shouldBe TopicMeta(6, 1)
    admin.alterCalls shouldBe empty
  }
}
