package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** A session built with the extensions class gets the native functions in
  * plain SQL, no imperative registration. Builds a separate SparkSession
  * over the shared SparkContext (getOrCreate would return the existing
  * session and skip extension injection). */
class GraftExtensionsSpec extends AnyFlatSpec with Matchers {

  "GraftExtensions" should "inject the native expressions into SQL" in {
    val shared = SparkSpec.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      s.sql(
        "SELECT graft_ldot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").collect()(0)
        .getLong(0) shouldBe 32L
      s.sql(
        "SELECT graft_murmur2(cast('21' as binary)) AS h").collect()(0)
        .getInt(0) shouldBe -973932308 // frozen golden
      s.sql(
        "SELECT graft_wngram_stats('a b a b a b', 3) AS st").collect()(0)
        .getSeq[Long](0) shouldBe Seq(4L, 2L)
      s.sql(
        "SELECT size(graft_wngrams('a b c d', 2)) AS n").collect()(0)
        .getInt(0) shouldBe 3
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
