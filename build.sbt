ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "csv_to_parquet_aws_datalakespark"
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
// PlanSnapshotSpec recomputes every physical-plan digest and compares
// against plans_r11.json, which graft.PlanDigest generates in a FRESH
// JVM. Digests are sensitive to Spark CacheManager state: once any
// suite persists a shared stage (signature tables, staged pair
// artifacts), later-built plans show InMemoryTableScan where the
// committed digest recorded the raw subtree — so the comparison is
// only deterministic when the spec sees the same cache-registration
// order as the digest run (both iterate keys sorted). Isolating the
// spec in its own forked JVM reproduces the digest run's conditions
// exactly, independent of suite execution order.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / forkOptions).value
  val (isolated, rest) =
    tests.partition(_.name == "graft.PlanSnapshotSpec")
  Seq(
    Tests.Group("plan-snapshot", isolated, Tests.SubProcess(opts)),
    Tests.Group("rest", rest, Tests.SubProcess(opts)))
}
// Forked `run` output must reach stdout RAW: sbt's default LoggedOutput
// prefixes every line with "[info] ", which breaks any consumer that
// json-parses the benchmark summary line from the process tail.
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 16g default: the 200-key suite keeps session-lifetime caches
  // (signature/cluster staging tables) while 32 task threads run —
  // at 8g the tail of the suite hit GC-pressure episodes (one key
  // measured 21 s vs 0.6 s isolated). The container has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
