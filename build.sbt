ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "affinityspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench/verify driver parses the LAST stdout line as JSON: pass the
// forked program's output through unprefixed (no "[info] " wrapper) and
// drop sbt's "[success] Total time" footer so the JSON line stays last.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g: local[32] benches pin localCheckpoint blocks + broadcasts between
  // ContextCleaner passes; 8g put the storm threshold mid-bench (this
  // container has 128 GiB).
  // NOTE: do NOT pin -Xms to -Xmx: measured 2x WORSE across the whole
  // bench (105 s vs 53 s total; heavy queries 3x) — a permanently-huge G1
  // young gen turns every collection into a long copy pause under Spark's
  // allocation rates. Let ergonomics size the heap.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 70+ queries × whole-stage codegen = hundreds of generated classes; the
  // JDK default 240m code cache fills mid-bench and JIT quietly shuts off
  // (interpreter fallback on whoever runs last)
  "-XX:ReservedCodeCacheSize=512m",
)
