ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bookstoreawslakehousespark"
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
// Default forked-JVM heap: 2/5 of host RAM capped at 32g (a fixed 32g
// would let the heap grow into swap/OOM on smaller hosts; the full-
// catalog bench wants well above the old 8g). SPARK_DRIVER_MEM overrides.
val defaultHeapGb: Long = {
  val hostGb =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      .getTotalMemorySize / (1L << 30)
    catch { case _: Throwable => 20L }
  math.max(4L, math.min(32L, hostGb * 2 / 5))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
  // A long catalog run (Bench/Verify: 100+ distinct queries in one JVM)
  // compiles thousands of whole-stage-codegen classes; the JVM default
  // 240 MB code cache fills mid-run, the JIT stops compiling, and
  // expression-heavy queries degrade 2-8x (measured: full-catalog bench
  // 260 s -> 211 s with the larger cache, q30 25 s -> 10 s).
  "-XX:ReservedCodeCacheSize=1g",
)
