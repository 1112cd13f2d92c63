ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lindelspark"
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
// Forked run output goes straight to stdout WITHOUT sbt's "[info] "
// decoration, so the driver can parse graft.Bench's one-line JSON
// (round-2 verdict: BENCH parsed=null because of the [info] prefix).
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
  // Generated-code cache sized to the suite (spark.* system properties
  // load into every SparkConf, so this covers the per-suite test
  // sessions too): at the 100-entry default each suite's hundreds of
  // codegen units thrash the cache and every action re-runs Janino
  // compilation on the driver thread — measured 384 s for
  // QuantilesSpec's 7 tiny tests, with per-job wall at ~30 ms and the
  // rest of the time between jobs.
  "-Dspark.sql.codegen.cache.maxEntries=4096",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
