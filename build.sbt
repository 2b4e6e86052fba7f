ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "polarsorderbookspark"
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
// Forked `runMain` output bypasses sbt's logger: Bench/Verify print
// machine-read JSON lines on stdout, and the default LoggedOutput wraps
// every line in "[info] " / "[error] " prefixes that break the driver's
// JSON parse (BENCH_r0{3,4}.json recorded `parsed: null` for exactly
// this reason).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// ~100 suites share ONE forked test JVM; at 8g, accumulated heap
// pressure can fatally wound the shared SparkContext mid-run (the
// DAGScheduler event loop stops the context on an OOM, and every later
// suite then fails on a stopped context — the r18 driver gate). The
// later -Xmx wins in HotSpot, so this overrides the 8g above for the
// test fork only. The box has 128 GiB; 16g is cheap insurance.
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "16g")}"
