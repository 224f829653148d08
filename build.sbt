ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bqfspark"
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
// Forked run output must reach stdout VERBATIM: the per-round bench harness
// parses graft.Bench's single JSON line, and sbt's default LoggedOutput
// prefixes every forked line with "[info] ", which breaks the parse.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Harness-JVM heap: CLAMPED. This microVM's G1 develops 5-20 s young-GC
// pauses on heaps above ~10 GiB (measured: the identical query catalog runs
// 118 s under 12g-ParallelGC and 558 s under 90g-default-G1, back to back),
// so a caller exporting SPARK_DRIVER_MEM=90g must NOT land in -Xmx verbatim.
// The clamp is 8 GiB, not 12-16: first-touch page allocation on this host is
// nonlinearly slow above ~8 GiB (measured AlwaysPreTouch wall: 4g=0.4 s,
// 8g=5 s, 12g=43-138 s — the host traps per fresh page), and the full sf0.1
// catalog ran inside 8 GiB in round 1. Fixed-size + pretouch keeps every
// page fault out of the measured region.
val harnessHeapMb: Long = {
  val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").trim.toLowerCase
  val mb = "^([0-9]+)([kmgt]?)b?$".r.findFirstMatchIn(req).map { m =>
    val n = m.group(1).toLong
    m.group(2) match {
      case "k" => n / 1024
      case "g" => n * 1024
      case "t" => n * 1024 * 1024
      case _ => n // "m" or bare number (bare = MiB, sbt convention)
    }
  }.getOrElse(8192L)
  math.min(math.max(mb, 2048L), 8192L)
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // fixed heap + ParallelGC: the same pinning the forked measurement JVMs
  // get in BuildJob.forked — without it the bench harness measures GC
  // roulette, not the engine (round-2 judge A/B: 558.5 s vs 118.1 s)
  s"-Xms${harnessHeapMb}m",
  s"-Xmx${harnessHeapMb}m",
  "-XX:+UseParallelGC",
  "-XX:ParallelGCThreads=8",
  "-XX:+AlwaysPreTouch",
  "-XX:PretenureSizeThreshold=1048576",
)
