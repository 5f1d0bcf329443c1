ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdata_infra_cs489spark"
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
// Forked-run stdout passes through UNPREFIXED: the default LoggedOutput
// strategy stamps every line with "[info] ", which is exactly what kept
// the driver's BENCH parse null through round 6 — the compact JSON line
// printed by graft.Bench arrived as `[info] {...}` and failed the
// {-first check. StdoutOutput also keeps the forked process's stderr on
// sbt's stderr instead of folding it into stdout as "[error] " lines.
run / outputStrategy := Some(StdoutOutput)
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
  // 32 executor threads share this single-JVM heap (execution memory ≈
  // fraction×heap/32 per task): 8g made the heavy pairwise queries spill
  // once the cross-query caches filled — the target box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // JIT bandwidth for the codegen storm (r14 measurement): a full
  // registry run compiles thousands of distinct Catalyst-generated
  // classes, and the JVM's default compiler-thread count (3-4 on a
  // 32-core box) drains that queue so slowly that the first ~40 queries
  // after the concurrent prebuild phase ran their generated code at
  // C1/interpreter speed for all reps — measured 4-7× their isolated
  // medians (dedup_simhash_pairs 4.97 s vs 0.68 s, op_snapshot_diff
  // 4.18 s vs 0.72 s on the same commit), decaying over minutes exactly
  // as the queue drained, with C2 compiler threads the hottest threads
  // in the process while executor threads idled. A quarter of the cores
  // as compiler threads (A/B: cores/2 drained fastest but taxed the
  // saturated prebuild phase ~30 s of wall; cores/4 keeps the queue
  // short while Bench's post-prebuild JIT-drain wait absorbs the rest),
  // scaled to the box so smaller CI hosts aren't oversubscribed.
  s"-XX:CICompilerCount=${math.max(4, java.lang.Runtime.getRuntime.availableProcessors() / 4)}",
) ++
  // ad-hoc profiling hook (GC logs, JFR, agent flags) without editing the
  // build: SPARK_GRAFT_JAVA_OPTS="-Xlog:gc" sbt "runMain graft.Bench"
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
