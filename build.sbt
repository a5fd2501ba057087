ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "autofeatursspark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Polars-parity float semantics (NaN/Inf, no arithmetic errors); Spark 4 defaults
  // ANSI on, which turns zero-variance corr / div-by-zero into exceptions.
  "-Dspark.sql.ansi.enabled=false",
  // 20g default (was 8g): the bench's concurrent headline jobs sort ~3.5M
  // wide rows across 32 local executor threads; at 8g the execution pool
  // (~4.6g) sits one eviction storm away from the G1 thrash mode BASELINE.md
  // round 6 documents (gc_ms 15k, every headline run slow). Parameterised —
  // cluster deployments size executor heaps via spark-submit, not this knob.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  // Xms=Xmx alone back-loads the OS page-zeroing of the big heap into the
  // measured queries (scattered multi-second mutator stalls at LOW gc_ms —
  // A/B'd: 78-88 s totals vs 45.5 s with pre-touch); zero the pages once at
  // JVM startup instead, outside every timed region.
  "-XX:+AlwaysPreTouch",
)
