package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (name <- Seq("q2_range_scan", "q3_point_lookup", "q5_star_join", "q10_global_enrich", "q4_compact_latest", "d5_dedup_embedding")) {
      println(s"========== $name ==========")
      val plan = SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString
      // surface the interesting lines only
      plan.split("\n").filter(l => l.contains("PushedFilters") || l.contains("Scan parquet") ||
        l.contains("Join") || l.contains("HashAggregate") || l.contains("Exchange") ||
        l.contains("ReadSchema")).take(14).foreach(l => println(l.trim.take(220)))
    }
    spark.stop()
  }
}
