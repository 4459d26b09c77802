ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "streamingfeaturestorespark"
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
// 32g default: the container has 128 GiB and local[32] puts driver +
// all executor threads + memory-sink tables in ONE JVM — an 8g heap
// GC-storms under the 107-query Bench (observed: a 20k-row query's
// median inflated 5-10x with a 209 s worst run purely from collection
// pauses). Override with SPARK_DRIVER_MEM.
// ParallelGC: these are batch-throughput JVMs (Bench/Verify/tests) — G1's
// concurrent cycles measurably tax the stateful operators (GC pauses get
// attributed to every running task; observed 30-45% of wall in long
// multi-query runs). Pause times are irrelevant here.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  "-XX:+UseParallelGC",
  // fixed 1g young gen: on this VM first-touch of freshly-expanded heap
  // pages is orders of magnitude slower than warm pages (measured young
  // collections of ~3 GB pausing 4-21 s while the heap grew). A bounded
  // young gen recycles the same warm pages every collection instead of
  // letting the ergonomics expand into cold memory mid-query.
  // initial heap overridable for timing experiments (round 9: iterative
  // graph queries drift ~2x with old-gen expansion; a larger pre-touched
  // Xms pays the page faults once at JVM start instead of mid-query)
  s"-Xms${sys.env.getOrElse("SPARK_GRAFT_XMS", "2g")}", "-Xmn1g",
) ++ (if (sys.env.contains("SPARK_GRAFT_PRETOUCH"))
        Seq("-XX:+AlwaysPreTouch") else Seq.empty)
