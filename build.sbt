ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "smartenergyconsumptionanalyticsusingbigdataspark"
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
// One forked JVM PER SUITE, up to SPARK_GRAFT_TEST_JVMS (default 4) at a
// time. The single shared-JVM run measured 37:37 on a quiet box (five
// chained-state integration tests alone are ~19 min, and the wall is
// dominated by per-stage Spark machinery, not assertions) — long enough
// that a loaded driver run hit its harness timeout mid-StreamingSpec and
// the shutdown hook's SparkContext stop failed the in-flight streaming
// drain (VERIFY_r19 tests_ok:false). Per-suite JVMs keep every suite's
// session fully isolated (no shared-session conf/cache/view races — the
// reason in-JVM testForkedParallel was NOT used) while the heavy suites
// overlap; suites themselves still run their tests sequentially, so
// nothing about any test changes. Scratch is per-JVM temp dirs and
// external-path tables only (audited) — no cross-JVM state.
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  (Test / definedTests).value.map { t =>
    Tests.Group(t.name, Seq(t),
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }
}
Global / concurrentRestrictions := {
  val jvms = sys.env.get("SPARK_GRAFT_TEST_JVMS")
    .flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(4)
  Seq(Tags.limit(Tags.ForkedTestGroup, jvms),
    Tags.limitAll(math.max(jvms, java.lang.Runtime.getRuntime
      .availableProcessors())))
}
// The bench/verify harness parses the LAST stdout line as JSON. sbt's
// default LoggedOutput strategy prefixes every forked-process line with
// "[info] ", which breaks that parse — pass stdout through untouched.
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
  // 12g: local[32] runs 32 executor threads in ONE JVM sharing unified
  // memory with every suite's accumulated localCheckpoint blocks — at
  // 8g the corpus-composition suites sit at the execution-memory edge
  // (BytesToBytesMap growth failures can kill the shared context on a
  // tight host). Override via SPARK_DRIVER_MEM on smaller machines.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
)
