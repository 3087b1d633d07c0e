ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datacurationllmspark"
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
  // 32-thread local runs need headroom: GC becomes the serial
  // bottleneck in an 8g heap (measured — see BASELINE.md notes)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Xms=Xmx: G1's adaptive sizing otherwise uncommits and recommits
  // heap regions continuously; on this memory-overcommitted host each
  // recommit page-faults at ~100× normal cost, showing up as the
  // sys-heavy VM degradation mode documented in BASELINE.md. A fixed
  // heap faults each page at most once.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
) ++ (
  // pre-fault the whole heap at JVM start so no timed rep (or driver-
  // run bench) ever pays the host's slow first-touch cost; the cost
  // moves to a one-time startup hit (~15s calm, minutes when the host
  // is degraded — which is exactly when it matters). Opt out with
  // SPARK_GRAFT_PRETOUCH=0.
  if (sys.env.get("SPARK_GRAFT_PRETOUCH").contains("0")) Nil
  else Seq("-XX:+AlwaysPreTouch")
)
