ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parquetplaygroundspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Explicit pin of the sbt default: suites in the forked JVM run
// SEQUENTIALLY. PlanSpec's w3b gate-path lock mutates a process-global
// sysprop (graft.rangeframe.decomposeOverBytes) inside try/finally —
// sound only while no other suite executes concurrently in that JVM.
Test / testForkedParallel := false
run / fork := true
// Without this, sbt routes the forked app's stdout through its logger,
// prefixing every line with "[info] " — which breaks any consumer that
// tail-parses Bench/Verify JSON lines (json.loads("[info] {...}") fails).
// StdoutOutput passes the child's stdout through verbatim.
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
  // A ~180-query suite generates thousands of whole-stage-codegen classes.
  // Spark's generated-class cache defaults to 100 entries, so every rerun
  // recompiles every stage through Janino, and the churned classes fill the
  // JVM's JIT code cache — once full, HotSpot stops compiling and late
  // queries run interpreted (observed 10x: 14.3 s vs 1.4 s isolated; the
  // round-4 2000-entry/512m setting saturated again at 182 queries:
  // in-suite readings ran up to 5x their isolated times).
  "-Dspark.sql.codegen.cache.maxEntries=10000",
  "-XX:ReservedCodeCacheSize=1g",
  // GC/heap were A/B-measured on the full 190-query suite (round 7):
  // G1+8g 80.3/81.0 s, ParallelGC+8g 85.3 s, G1+24g 91.0 s — all within
  // the machine's noise band, so the JVM defaults stay.
)
