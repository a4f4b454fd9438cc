package graft

import graft.core.GraftCatalog

class GraftCatalogSpec extends SparkSpec {

  "GraftCatalog" should "expose tables and native functions to plain SQL" in {
    GraftCatalog.register(spark, "/root/testdata/sf0.001")
    spark.sql("SELECT count(*) FROM lineitem").collect()(0).getLong(0) shouldBe 6000L
    // events view carries the canonical epoch-µs column
    spark.sql("SELECT min(ts_us) FROM events").collect()(0).getLong(0) should be > 0L
    // native functions resolve in SQL
    spark.sql(
      """SELECT user_id, pmod(graft_murmur2(cast(cast(user_id AS STRING) AS BINARY)) & 2147483647, 32) AS p
        |FROM events LIMIT 1""".stripMargin).collect()(0).getInt(1) should (be >= 0 and be < 32)
  }

  it should "drive the text pipeline from plain SQL with the native functions" in {
    GraftCatalog.register(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      """SELECT doc_id,
        |  graft_simhash(graft_tokens(text), 16) AS sh,
        |  graft_langid(graft_tokens(text), 'en:the,a,of;de:der,die') AS lang,
        |  graft_stopcount(graft_tokens(text), 'the,a,of') AS stops,
        |  graft_toklen(graft_tokens(text)) AS len
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    r.length shouldBe 5
    all(r.map(_.getLong(1))) should (be >= 0L and be < 65536L)
    all(r.map(_.getString(2))) should fullyMatch regex "en|de|und"
    all(r.map(_.getLong(4))) should be > 0L
  }
}
