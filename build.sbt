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
  // 16g pre-touched initial heap (round 9): with -Xms2g the old gen
  // expanded mid-run and first-touch page faults landed on whichever
  // query was allocating — measured as phantom 2-4x medians on random
  // suite members (stream_winsorize 4.8 -> 16.2 s, graph family ~2x);
  // the pre-touched run of the same 291-query bench had ZERO outliers
  // (worst 10.25 s). Pays one ~15 s page-fault bill at JVM start
  // instead of unbounded stalls mid-query. Override/disable via env.
  s"-Xms${sys.env.getOrElse("SPARK_GRAFT_XMS", "16g")}", "-Xmn1g",
) ++ (if (sys.env.contains("SPARK_GRAFT_NO_PRETOUCH")) Seq.empty
      else Seq("-XX:+AlwaysPreTouch"))
