ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigslicespark"
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
// Driver bench contract: the forked JVM's stdout must reach the caller
// verbatim (no "[info] " prefix) and the LAST stdout line must be the
// bench's compact JSON (no trailing "[success] Total time ..." banner) —
// every BENCH_r*.json through r14 has "parsed": null because the driver's
// stdout-tail parser saw sbt's decorations instead of bare JSON.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // JDK-8192647: with 32 executor threads holding JNI critical regions
  // (parquet/zstd native buffers), G1's GCLocker can starve a tiny
  // allocation past the DEFAULT retry count of 2 and throw a spurious
  // OOM ("Retried waiting for GCLocker too often allocating 4 words")
  // with plenty of heap free — observed killing the 500k stress leg.
  // (diagnostic flag on JDK 17, hence the unlock)
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
)
