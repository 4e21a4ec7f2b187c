ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "prometldbspark"
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
// Pass the forked JVM's stdout through verbatim: the bench/verify harness
// parses the final stdout line as JSON, and sbt's default LoggedOutput
// strategy prefixes every line with "[info] ", which breaks that parse.
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
// Local-harness I/O placement: stream checkpoints, temp fixtures, and
// shuffle spill live in java.io.tmpdir / spark.local.dir. On this box
// /tmp is a virtual disk whose fsyncs dominate the streaming gates'
// state-store commits, while /dev/shm is tmpfs — a cluster provides its
// own fast local disks, so pinning the single-box harness to tmpfs is
// placement, not a semantics change. Falls back to /tmp when absent.
// GRAFT_NO_SHM=1 opts out (and the redirect needs ≥4 GiB free tmpfs):
// at larger scale factors shuffle spill on RAM-backed tmpfs consumes
// physical memory and fails in ways that look like engine bugs rather
// than disk-full — bigger-SF runs fall back to real disk deliberately.
val shmTmp: Seq[String] = {
  val shm = file("/dev/shm")
  val optOut = sys.env.get("GRAFT_NO_SHM").exists(_.nonEmpty)
  val freeOk = try shm.getUsableSpace > 4L * 1024 * 1024 * 1024
    catch { case _: Throwable => false }
  if (!optOut && freeOk && shm.isDirectory && shm.canWrite) {
    val t = shm / "graft-tmp"
    IO.createDirectory(t)
    Seq(s"-Djava.io.tmpdir=${t.getAbsolutePath}",
      s"-Dspark.local.dir=${(t / "spark").getAbsolutePath}")
  } else Seq.empty
}
javaOptions ++= jdk17AddOpens ++ shmTmp ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g with Xms pinned: the 200-query harness session accumulates
  // cached frames, codegen classes and plan state; an 8g heap put G1
  // into periodic full-region evacuations mid-bench (wall-clock noise
  // attributed to queries), and a floating Xms adds heap-resize pauses.
  // The box has 128 GiB; a real driver would size this the same way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ {
  // GC selection (A/B-able): JDK 17 defaults to G1, which optimizes
  // pause time. A bench/ETL driver wants THROUGHPUT — short-lived
  // query-churn allocation with no latency SLO — where ParallelGC's
  // cheaper barriers and compacting young collections win. Measured on
  // the full 225-query pack at sf0.1 before making it the default (see
  // README); GRAFT_GC=g1 restores the JDK default for comparison runs.
  sys.env.getOrElse("GRAFT_GC", "parallel") match {
    case "parallel" => Seq("-XX:+UseParallelGC")
    case "g1"       => Seq("-XX:+UseG1GC") // the JDK-17 default, explicit
    case other      => // a typo'd A/B run must not silently measure G1
      sys.error(s"GRAFT_GC must be 'parallel' or 'g1', got '$other'")
  }
}
