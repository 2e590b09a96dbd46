ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "seqdbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// suites share one SparkSession (SparkSpec); run them sequentially so
// session-conf-mutating tests can't race concurrent suites
Test / parallelExecution := false
run / fork := true
// the bench/verify driver parses a bare JSON line from stdout — don't
// let sbt prefix forked-run output with "[info] ", and don't let the
// "[success] Total time: ..." trailer follow the JSON (the driver
// tail-parses the LAST stdout line; r5/r6 records show "parsed": null
// because the trailer displaced the JSON)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
// self-installing compile guard: any sbt invocation (re)installs the
// pre-commit hook, so a fresh checkout can never commit non-compiling
// Scala sources (the round-11 lesson — one missing import shipped in
// the end-of-round snapshot zeroed the round's entire correctness
// record). The hook delegates to tools/precommit_compile.sh, which
// runs `sbt Test/compile` only when .scala/.sbt files are staged.
Global / onLoad := (Global / onLoad).value andThen { st =>
  try {
    val hook = file(".git/hooks/pre-commit")
    if (file(".git").isDirectory && file("tools/precommit_compile.sh").exists
        && !hook.exists) {
      IO.write(hook, "#!/bin/sh\nexec sh tools/precommit_compile.sh\n")
      hook.setExecutable(true)
      ()
    }
  } catch { case _: Throwable => () }
  st
}
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// local[32] is a single JVM carrying all 32 executor threads'
// task memory: 8g forced late-sweep full GCs that inflated bench
// outliers up to 12x (r8 dp_ann_pq_rerank 12.7s vs 1.2s at a
// right-sized heap). Default to ~3/8 of the 128 GiB box; cap at
// half of physical RAM so smaller machines still boot.
// the com.sun cast is a probe, not a requirement: on a JVM that
// doesn't expose it, degrade to 8g instead of failing the build
val forkedHeapGb: String = sys.env.getOrElse("SPARK_DRIVER_MEM",
  scala.util.Try(
    math.min(48L, math.max(4L,
      java.lang.management.ManagementFactory.getOperatingSystemMXBean()
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        .getTotalMemorySize / (2L << 30)))).getOrElse(8L).toString + "g")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$forkedHeapGb",
  // pre-size the heap to Xmx: growing a 48g heap from the default few
  // hundred MB costs a long ladder of expansion full-GCs exactly when
  // the first allocation-heavy job runs — measured at the sf1 replica
  // as 126 s cold ingest vs 53 s with a pre-sized heap (same code,
  // same box). Commit is virtual (no AlwaysPreTouch): RSS still grows
  // only with live data, so small boxes are unaffected.
  s"-Xms$forkedHeapGb",
) ++
  // ad-hoc forked-JVM flags for experiments (GC selection, GC logs)
  // without editing the build: SPARK_GRAFT_JVM_OPTS="-XX:+UseZGC ...".
  // KNOWN LIMITATION: split on whitespace — a single flag whose VALUE
  // contains spaces (e.g. -Xlog:gc*:file=a path/with space) breaks
  // apart silently; quote-aware splitting is deliberately not
  // implemented for an ad-hoc knob, use space-free paths.
  sys.env.get("SPARK_GRAFT_JVM_OPTS").map(_.trim).filter(_.nonEmpty)
    .map(_.split("\\s+").toSeq).getOrElse(Seq.empty)
