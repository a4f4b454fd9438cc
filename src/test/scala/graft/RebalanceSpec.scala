package graft

import graft.streaming.Rebalance
import graft.streaming.Rebalance.Assignment
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Rebalance planner parity with reference cli/RebalanceTool.scala:
  * target rule brokers((p + r) % n), modified-only JSON plan, drain and
  * under-replication failure modes. */
class RebalanceSpec extends AnyFlatSpec with Matchers {

  private val topicState = Map(
    ("t1", 0) -> List(1, 2),
    ("t1", 1) -> List(2, 3),
    ("t1", 2) -> List(3, 1))

  "propose" should "apply the reference round-robin rule over sorted brokers" in {
    val out = Rebalance.propose(topicState, List(3, 1, 2), replicationFactor = 2)
    // sorted live brokers = [1,2,3]; target(p, r) = brokers((p + r) % 3)
    out shouldBe List(
      Assignment("t1", 0, List(1, 2), List(1, 2)),
      Assignment("t1", 1, List(2, 3), List(2, 3)),
      Assignment("t1", 2, List(3, 1), List(3, 1)))
    all(out.map(_.modified)) shouldBe false
    Rebalance.planJson(out) shouldBe None // "All topics are balanced"
  }

  it should "spread replicas across distinct brokers and rotate leaders" in {
    val many = (0 until 12).map(p => ("t", p) -> List.empty[Int]).toMap
    val out = Rebalance.propose(many, List(10, 20, 30, 40), replicationFactor = 3)
    all(out.map(_.target.distinct.size)) shouldBe 3
    // leadership (r = 0) rotates uniformly: each broker leads 12/4 times
    out.groupBy(_.target.head).view.mapValues(_.size).toMap shouldBe
      Map(10 -> 3, 20 -> 3, 30 -> 3, 40 -> 3)
  }

  it should "drain an ignored broker and emit the reassignment plan" in {
    val out = Rebalance.propose(topicState, List(1, 2, 3), replicationFactor = 2,
      ignoreBrokers = Set(3))
    // live = [1,2]: p0 -> [1,2], p1 -> [2,1], p2 -> [1,2]
    out.map(_.target) shouldBe List(List(1, 2), List(2, 1), List(1, 2))
    all(out.flatMap(_.target)) should not be 3
    val json = Rebalance.planJson(out).get
    json should startWith("""{"version":1,"partitions":[""")
    // p0's current [1,2] == target -> excluded from the plan
    json should not include """"partition":0"""
    json should include(""""topic":"t1","partition":1,"replicas":[2,1]""")
    json should include(""""topic":"t1","partition":2,"replicas":[1,2]""")
  }

  it should "reject an unsatisfiable replication factor like the reference" in {
    val e = intercept[IllegalArgumentException] {
      Rebalance.propose(topicState, List(1, 2, 3), replicationFactor = 3,
        ignoreBrokers = Set(2))
    }
    e.getMessage should include("higher than number of available brokers")
    intercept[IllegalArgumentException] {
      Rebalance.propose(topicState, List(1), replicationFactor = 0)
    }
  }
}
