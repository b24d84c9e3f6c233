ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "btrblocksspark"
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
// Forked run output passes through RAW (no sbt "[info] " prefix): the
// bench driver parses Bench's final stdout line as JSON, and the logger
// prefix has broken that parse in every round since r01 (BENCH_r*.json
// all carry parsed:null with the line visible but "[info] "-prefixed in
// the tail). StdoutOutput applies to run/runMain only; test output still
// goes through the logger.
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
  // JDK 17 defaults GCLockerRetryAllocationCount to 2: with 32 executor
  // threads holding JNI critical sections (zlib/snappy, DirectByteBuffer
  // bulk ops) an allocation can spuriously throw OutOfMemoryError
  // ("Retried waiting for GCLocker too often") with the heap nowhere
  // near full — observed once killing a 34-min sf10 battery at 16g while
  // allocating SIX WORDS. Retrying more is strictly safer than dying.
  // (Diagnostic flag on JDK 17, hence the unlock.)
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
)
// FsstVectorKernel.java (SWAR sizing + VarHandle word stores) is plain
// java.base — the jdk.incubator.vector variant was measured and
// rejected for its pre-C2 interpreter cliff (BASELINE.md round 18)
javacOptions ++= Seq("--release", "17")
