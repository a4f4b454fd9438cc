package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a set of queries to files — the
  * before/after plan evidence of an optimization round. Usage:
  *
  *   sbt "runMain graft.PlanDump /root/testdata/sf0.1 plans/r15 _before q1_pricing_summary,q5_star_join"
  *
  * One JVM for the whole list (a per-query RunOne would pay ~30 s of sbt +
  * session startup per plan). Streaming (w*) queries would DRAIN on plan
  * construction (StreamRun materializes eagerly), so they are dumped from
  * the RETURNED frame — for them this shows the post-drain batch plan over
  * the memory sink plus any downstream batch operators, which is exactly
  * the part a batch plan diff can speak to. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(',').map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"dumped $name")
    }
    spark.stop()
  }
}
