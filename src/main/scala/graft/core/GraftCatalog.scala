package graft.core

import org.apache.spark.sql.SparkSession

/** SQL surface: register the testdata tables as temp views and the native
  * functions, so the whole engine is drivable from `spark.sql` — the
  * declarative analogue of the reference's HTTP query surface (its route
  * handlers compile to typed messages; here they compile to SQL over the
  * same relations, SURVEY §3.1). */
object GraftCatalog {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Create temp views for every table in `dir` + register graft functions.
    * `events` gets the canonical epoch-µs `ts_us` column. */
  def register(spark: SparkSession, dir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    TableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case name =>
        spark.read.parquet(Tables.path(dir, name)).createOrReplaceTempView(name)
    }
  }
}
