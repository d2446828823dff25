ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lanceduckdbspark"
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
// Driver-parseable bench contract (round 17): the driver greps the LAST
// ~2000 chars of `sbt "runMain graft.Bench"` stdout for Bench's one-line
// JSON, and has failed to parse it every round since r12 because (a) the
// forked run's stdout was logged through sbt with an "[info] " prefix and
// (b) sbt appended a trailing "[success] Total time: ..." line. Route the
// forked JVM's stdout straight to the console (same as forked tests
// already do) and drop the success trailer so the final stdout line IS
// the machine-readable JSON.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by the command engine, not a task — exempt it
// from the unused-key lint so the startup banner stays clean
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
