ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dislibspark"
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
// The round driver parses the FINAL stdout line of a bench run as JSON;
// sbt's "[success] Total time: ..." trailer landed after graft.Bench's
// summary line every round (BENCH_r{N}.json "parsed": null). Suppress
// the success + timing trailer lines so the forked main's last println
// is also the process's last stdout line. Outcomes still ride exit
// codes (and scalatest prints its own per-suite results).
Global / showSuccess := false
Global / showTiming := false
// the two keys are read by sbt's command engine, not by tasks — keep
// the unused-key lint quiet
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
// ...and pass the forked process's streams through verbatim instead of
// relaying them through sbt's logger, which prefixes every stdout line
// with "[info] " — that prefix alone fails a strict JSON parse of the
// tail's final line.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  // netlib-java picks SIMD VectorBLAS only when the incubator vector
  // module is on — without it every BLAS call (GMM/KMeans/TSQR E-steps)
  // runs scalar Java11BLAS (measured 8 vs ~25 GFlop/s dgemm here)
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // long-session hygiene (r14): a 330-gate bench run generates
  // thousands of whole-stage-codegen classes — headroom over the 240m
  // default keeps the JIT compiling for the heavy entries at the END
  // of the session (the r14 idle capture measured its late tail
  // 1.4-1.8x above fresh-JVM solo pins with every steal probe clean).
  // r15 optimization round: raised 512m -> 1g — the AQE SMJ→SHJ
  // conversion roughly doubles the join-codegen variety across the 450
  // entries, and all three full captures with it stamped the LAST
  // compute-heavy entries (algo_kmeans 32-49 s vs 6.6-8.6 s in four
  // fresh-JVM solo runs, both serializers, clean dual probes) — the
  // signature of code-cache flushing de-optimizing the hot assign
  // loops late in the session.
  "-XX:ReservedCodeCacheSize=1g",
  // the app/SQL status stores collect per-execution plan graphs and
  // metrics even with the UI off; at 330+ executions that is pure
  // old-gen ballast for a bench/verify session
  "-Dspark.ui.retainedJobs=100",
  "-Dspark.ui.retainedStages=100",
  "-Dspark.ui.retainedTasks=5000",
  "-Dspark.sql.ui.retainedExecutions=20",
) ++
  // diagnostics hook (r16): lets a profiling run attach GC/JIT logging
  // (e.g. SPARK_GRAFT_EXTRA_JAVA_OPTS="-Xlog:gc*:file=/tmp/gc.log")
  // without editing the build — empty and inert otherwise
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS")
    .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
