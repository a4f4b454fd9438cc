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
}
