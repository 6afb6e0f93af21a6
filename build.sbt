ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hivekaspark"
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
// Pass the forked child's stdout through bare — without this sbt re-logs
// every line as "[info] ..." and the driver's bench-JSON parser fails.
run / outputStrategy := Some(StdoutOutput)
// ... and silence sbt's trailing "[success] Total time: ..." banner, which
// otherwise lands AFTER the bench JSON so it isn't the last stdout line.
Global / showSuccess := false
Global / showTiming := false
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
  "-Djava.awt.headless=true", // imageio media codec on a headless box
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // dev knob for config A/B runs: space-separated extra -D flags
  // (SparkConf picks up spark.* system properties); unset = no-op.
  // CAUTION (ADVICE r16): this is injected into EVERY sbt-forked JVM
  // — runMain graft.Verify / tests included, not just Bench — so an
  // A/B flag left exported in the shell alters verification runs too;
  // unset it before any oracle/correctness run. Values containing
  // spaces are not supported (split on single spaces, by design —
  // spark.* -D flags never need them).
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
