ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datafusionparallelismspark"
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
// Pass the forked JVM's stdout through raw instead of via sbt's logger:
// the driver greps the run log for Bench's ONE JSON line, and the
// logger's "[info] " prefix broke that parse in rounds 1-3
// (BENCH_r0{1,2,3}.json all show `parsed: null`).
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
// Panama Vector API (VectorDotKernel): javac needs the incubator module
// at compile time, the forked run/test JVMs at class-load time. JVMs
// without the flag are fine — the Scala side probes availability once
// per JVM and falls back to the scalar kernel (bit-identical results).
Compile / javacOptions ++= Seq("--add-modules", "jdk.incubator.vector")
javaOptions ++= jdk17AddOpens ++ Seq(
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default on the 128 GiB bench host: at 8g the local[32] driver
  // JVM GC-thrashed on the heavy tail queries (t8 measured 17.8 s with
  // 14.8 s of GC; same query 1.1 s at 24g) — the round-5 "regressions"
  // were exactly this amplified by host contention
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
