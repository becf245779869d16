ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "zyncspark"
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
// Inherit the forked process's stdio instead of re-logging it: sbt's default
// LoggedOutput prefixes every stdout line with "[info] ", which breaks the
// driver's single-JSON-line parse of Bench output (BENCH_r02 parsed=null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and drop sbt's trailing "[success] Total time" summary so the Bench
// JSON is also the LAST stdout line (robust to last-line-parse drivers).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // 24g default: local[32] runs 32 concurrent tasks in ONE heap — 8g gave
  // ~250MB/core and the bench suite spent its tail in GC (queries measured
  // 3-4x their isolated time). 24g ≈ 750MB/core, still below any real
  // cluster's per-core memory, on a 128GiB box.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
