ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "paper2tablespark"
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
// Forked `runMain` output must reach stdout RAW: sbt's default LoggedOutput
// prefixes every line with "[info] ", which broke machine parsing of the
// bench JSON line (BENCH_r01.json "parsed": null).
outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Catalyst-generated serializers for nested rows can exceed HotSpot's
  // huge-method bytecode limit and silently run interpreted (measured
  // 50-100x slowdowns); compile them anyway and give codegen room.
  "-XX:ReservedCodeCacheSize=512m",
  // GRAFT_JIT_TIER=1 pins C1-only compilation: ~30% below C2 peak but
  // deterministic, which is what a scaling-efficiency comparison needs
  // (C2 warm-up on this box varies 3x between identical JVMs).
  s"-XX:TieredStopAtLevel=${sys.env.getOrElse("GRAFT_JIT_TIER", "4")}",
  s"-XX:+Use${sys.env.getOrElse("GRAFT_GC", "G1")}GC",
)
