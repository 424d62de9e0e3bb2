ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "xgboost_rayspark"
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
// The round driver parses Bench's one-line JSON from the run's stdout
// tail; sbt's default forked-output strategy wraps every forked line
// in "[info] " (stderr in "[error] "), which breaks any
// line-anchored JSON parse. Inherit the sbt process streams instead
// so the forked JVM's stdout reaches the driver byte-for-byte.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[N] runs all N executor threads inside this one JVM, so the
  // heap serves 32 concurrent tasks plus the driver; 8g showed full-
  // suite GC stalls (isolated-query times 2-10x lower than the same
  // query mid-suite, r21 measurements). 16g on a 128 GiB box is still
  // conservative; override via SPARK_DRIVER_MEM either way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
