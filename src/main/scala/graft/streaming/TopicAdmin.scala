package graft.streaming

/** Topic admin / auto-configuration (SURVEY §2 S7).
  *
  * The reference creates and converges its changelog topics on startup:
  * `KafkaLogStorage.ensureExists` (kafka/storage-kafka/src/main/scala/io/
  * amient/affinity/kafka/KafkaLogStorage.scala:338-352) and
  * `ensureCorrectConfiguration` (:355-395) drive an `AdminClient` to
  * create the topic, pin `cleanup.policy` to `compact` (or
  * `compact,delete` when a TTL is set), set `retention.ms` from the TTL,
  * and verify partition count / replication factor
  * (`createTopicIfNotExists`:398-439).
  *
  * This container has no Kafka broker AND no kafka-clients jar, so the
  * admin plane is expressed against a minimal [[TopicAdmin]] seam — the
  * same injectable-transport pattern as
  * [[graft.serde.RegistryTransport]]: ALL of the reference's decision
  * logic (what to create, which configs diverge, when to alter vs warn vs
  * fail) lives here and is unit-tested against an in-memory fake; a
  * production deployment supplies a ~20-line adapter delegating each
  * method to `org.apache.kafka.clients.admin.AdminClient`
  * (`listTopics`/`createTopics`/`describeTopics`/`describeConfigs`/
  * `alterConfigs`).
  */
final case class TopicMeta(numPartitions: Int, replicationFactor: Int)

/** Broker admin seam. Implementations must make [[createTopic]] tolerate
  * concurrent creation (the reference retries through
  * `TopicExistsException` — an adapter should swallow it the same way). */
trait TopicAdmin {
  def listTopics(): Set[String]
  def createTopic(topic: String, numPartitions: Int, replicationFactor: Int): Unit
  def describeTopic(topic: String): TopicMeta
  def describeConfigs(topic: String): Map[String, String]
  def alterConfigs(topic: String, configs: Map[String, String]): Unit
}

/** Declarative spec for one changelog topic, mirroring the knobs the
  * reference reads from its `kafkaStorageConf` (Partitions, Compact, TTL,
  * replication factor). */
final case class TopicSpec(
    topic: String,
    partitions: Option[Int],
    compacted: Boolean,
    ttlMs: Long = 0L,
    replicationFactor: Int = 1)

object TopicEnsure {

  /** Kafka topic-config keys (string literals — the constants live in
    * kafka-clients' `TopicConfig`, absent from this classpath). */
  val CleanupPolicy = "cleanup.policy"
  val MessageTimestampType = "message.timestamp.type"
  val MessageTimestampDiffMaxMs = "message.timestamp.difference.max.ms"
  val RetentionMs = "retention.ms"
  val RetentionBytes = "retention.bytes"

  /** The reference's desired-config map for a state changelog topic
    * (KafkaLogStorage.scala:359-374): log-compacted, `compact,delete`
    * when a TTL bounds history, event-time stamping, and time-based (not
    * size-based) retention. */
  def desiredConfigs(ttlMs: Long): Map[String, String] = Map(
    CleanupPolicy -> (if (ttlMs > 0) "compact,delete" else "compact"),
    MessageTimestampType -> "CreateTime",
    MessageTimestampDiffMaxMs -> (if (ttlMs > 0) ttlMs else Long.MaxValue).toString,
    RetentionMs -> (if (ttlMs > 0) ttlMs else Long.MaxValue).toString,
    RetentionBytes -> "-1")

  /** Entry point ≡ `KafkaLogStorage.ensureExists` (:338-352):
    *   - managed + compacted topic → full configuration convergence;
    *   - managed, non-compacted     → create-and-verify only;
    *   - unmanaged (no partition count) → read-only check that warns on
    *     divergence but never mutates an externally-owned topic.
    * Returns the config delta that was applied (or would be, if read-only). */
  def ensureExists(admin: TopicAdmin, spec: TopicSpec): Map[String, String] =
    spec.partitions match {
      case Some(_) if spec.compacted =>
        ensureCorrectConfiguration(admin, spec, readonly = false)
      case Some(n) =>
        createTopicIfNotExists(admin, spec.topic, n, spec.replicationFactor)
        Map.empty
      case None =>
        ensureCorrectConfiguration(admin, spec, readonly = true)
    }

  /** ≡ `KafkaLogStorage.ensureCorrectConfiguration` (:355-395): create if
    * managed, diff actual configs against [[desiredConfigs]], then either
    * alter (merging the untouched existing entries, as the pre-2.3
    * non-incremental alter API requires) or — read-only — leave the topic
    * alone and surface the divergence. Returns the delta. */
  def ensureCorrectConfiguration(
      admin: TopicAdmin,
      spec: TopicSpec,
      readonly: Boolean): Map[String, String] = {
    spec.partitions.filter(_ > 0).foreach { n =>
      createTopicIfNotExists(admin, spec.topic, n, spec.replicationFactor)
    }
    val desired = desiredConfigs(spec.ttlMs)
    val actual = admin.describeConfigs(spec.topic)
    val delta = desired.filter { case (k, v) => !actual.get(k).contains(v) }
    if (delta.nonEmpty && !readonly) {
      // non-incremental alter: ship the full config map (changed entries
      // plus every untouched existing one) exactly as the reference does
      admin.alterConfigs(spec.topic, actual ++ delta)
    }
    delta
  }

  /** ≡ `createTopicIfNotExists` (:398-439): create when absent, then
    * VERIFY — partition count must match exactly, replication factor must
    * be at least the requested one; both failures are loud
    * (IllegalStateException), never silent divergence. */
  def createTopicIfNotExists(
      admin: TopicAdmin,
      topic: String,
      numPartitions: Int,
      replicationFactor: Int): Unit = {
    require(numPartitions > 0, s"numPartitions must be positive: $numPartitions")
    if (!admin.listTopics().contains(topic))
      admin.createTopic(topic, numPartitions, replicationFactor)
    val meta = admin.describeTopic(topic)
    if (meta.numPartitions != numPartitions)
      throw new IllegalStateException(
        s"topic $topic has ${meta.numPartitions} partitions, expecting: $numPartitions")
    if (meta.replicationFactor < replicationFactor)
      throw new IllegalStateException(
        s"topic $topic has replication factor ${meta.replicationFactor}, expecting at least: $replicationFactor")
  }
}
