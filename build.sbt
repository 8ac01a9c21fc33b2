ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "awsgluedatalakespark"
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
// Run the suites in PARALLEL forked JVMs: the suite is ~80 Spark
// sessions of mostly idle wall time (driver-side commits, tiny jobs on
// local[4]), so one sequential JVM took ~22 min while the box sat at
// low utilization. Six round-robin groups (alphabetical round-robin
// spreads the heavy Mv*/property suites across groups) run
// concurrently — 6 x local[4] fits the 32-core box — with a smaller
// per-JVM heap so six drivers stay well under the sandbox's memory.
// Suites stay fully isolated: each JVM builds its own SparkSession and
// every spec writes under its own createTempDirectory.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val forkOpts = (Test / forkOptions).value
  val n = 6
  tests.sortBy(_.name).zipWithIndex.groupBy(_._2 % n).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"group-$i", ts.map(_._1), Tests.SubProcess(forkOpts))
    }
}
Global / concurrentRestrictions := Seq(Tags.limit(Tags.ForkedTestGroup, 6))
Test / javaOptions += "-Xmx3g"
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
