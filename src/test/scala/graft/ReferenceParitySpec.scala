package graft

import graft.core.TimeRange
import graft.state.{KVTable, SecondaryIndex}
import org.apache.spark.sql.functions._

/** The reference's own example acceptance numbers, reproduced on this
  * engine (the "matches the reference's results on its own test queries"
  * gate).
  *
  * Fixture shapes follow FIXTURES.md §1–§2, which mirror
  * examples/example-range-lookups/.../ExampleBankSpec.scala:73-151 (6 txns,
  * 2 branches, 3 accounts, 3 days → counts 3/2/1 per account, 5/1 per
  * branch, unknown branch empty, branch-before-date 3) and
  * examples/example-secondary-index/.../ESecondaryIndexSpec.scala:122-148
  * (author's articles 2, word hits 4, since-filter 3, de-index on delete 0).
  */
class BankRangeLookupsParitySpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int): Long = // 2018-06-<d> UTC, epoch µs
    java.time.LocalDate.of(2018, 6, d).toEpochDay * 86400L * 1000000L

  // state `transactions`: key StorageKey(sortcode, account, txn), value amount
  private def txns = KVTable(
    Seq(
      ("10-10-10", 1, 1L, 100.0, day(26)),
      ("10-10-10", 1, 2L, 101.0, day(27)),
      ("10-10-10", 1, 3L, 102.0, day(28)),
      ("10-10-10", 2, 4L, 200.0, day(26)),
      ("10-10-10", 2, 5L, 201.0, day(28)),
      ("20-20-20", 3, 6L, 300.0, day(27)))
      .toDF("sortcode", "account", "txn", "amount", "ts_us"),
    keyCols = Seq("sortcode", "account", "txn"),
    tsCol = "ts_us")

  "GetAccountTransactions (routed point-range, J4)" should "return 3/2/1 per account" in {
    txns.scan(Seq("10-10-10", 1)).count() shouldBe 3
    txns.scan(Seq("10-10-10", 2)).count() shouldBe 2
    txns.scan(Seq("20-20-20", 3)).count() shouldBe 1
  }

  "GetBranchTransactions (scatter prefix scan, J3)" should "return 5/1 per branch, empty for unknown" in {
    txns.scan(Seq("10-10-10")).count() shouldBe 5
    txns.scan(Seq("20-20-20")).count() shouldBe 1
    txns.scan(Seq("30-30-30")).count() shouldBe 0
  }

  it should "honor TimeRange.until: branch 10-10-10 before 2018-06-28 → 3" in {
    txns.scan(Seq("10-10-10"), TimeRange.until(day(28))).count() shouldBe 3
  }
}

class SecondaryIndexParitySpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int): Long =
    java.time.LocalDate.of(2018, 6, d).toEpochDay * 86400L * 1000000L

  // articles keyed (authorId, seq) with tombstone support
  private val articles = Seq(
    (1, 1, "scala streams", day(26), false),
    (1, 2, "scala actors", day(27), false),
    (2, 1, "scala state", day(27), false),
    (2, 2, "scala kafka", day(28), false))
    .toDF("author", "seq", "title", "ts_us", "tombstone")

  private def kv(extra: Seq[(Int, Int, String, Long, Boolean)] = Nil) = KVTable(
    articles.unionByName(extra.toDF("author", "seq", "title", "ts_us", "tombstone")),
    keyCols = Seq("author", "seq"), tsCol = "ts_us", tombstoneCol = Some("tombstone"))

  "author's articles" should "be 2" in {
    kv().scan(Seq(1)).count() shouldBe 2
  }

  "word index lookup" should "hit all 4 articles for a common word" in {
    val latest = kv().latest
    val idx = SecondaryIndex.build(latest, Seq("author", "seq"), tokens(col("title")))
    SecondaryIndex.lookup(idx, latest, Seq("author", "seq"), "scala").count() shouldBe 4
  }

  it should "be time-boundable: hits since 2018-06-27 → 3" in {
    val latest = kv().latest
    val idx = SecondaryIndex.build(latest, Seq("author", "seq"), tokens(col("title")))
    SecondaryIndex.lookup(idx, latest, Seq("author", "seq"), "scala",
      tsCol = Some("ts_us"), range = TimeRange.since(day(27))).count() shouldBe 3
  }

  "delete-by-word" should "de-index: tombstoned article no longer found" in {
    // delete the article containing "kafka"
    val afterDelete = kv(Seq((2, 2, null.asInstanceOf[String], day(29), true)))
    val latest = afterDelete.latest
    val idx = SecondaryIndex.build(latest, Seq("author", "seq"), tokens(col("title")))
    SecondaryIndex.lookup(idx, latest, Seq("author", "seq"), "kafka").count() shouldBe 0
    SecondaryIndex.lookup(idx, latest, Seq("author", "seq"), "scala").count() shouldBe 3
  }

  private def tokens(c: org.apache.spark.sql.Column) =
    graft.functions.GraftFunctions.tokens(c)
}
