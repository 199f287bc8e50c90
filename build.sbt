ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "slicedbspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
scalacOptions ++= Seq("-deprecation")

// ---- parallel test groups (round 15) --------------------------------
// One forked JVM ran the whole suite in ~9.5 min of mostly sequential
// Spark-action latency — more than the driver's `sbt test` window
// (VERIFY_r14 cut off mid-suite). Suites now split across several
// forked JVMs, each with its OWN SparkSession (full isolation: the
// suites that mutate session conf, count listener jobs or release
// CacheBook scopes cannot race each other), greedy-packed by measured
// suite duration so the groups finish together. Weights are a
// heuristic from a -oD timing run; an unlisted suite defaults small —
// imbalance degrades wall, never correctness.
val testSuiteWeights: Map[String, Double] = Map(
  "ConnectedComponentsSpec" -> 65, "DbscanSpec" -> 47,
  "PlanShapeSpec" -> 29, "StreamingSpec" -> 27,
  "BoundedPercentileSpec" -> 26, "SlicerSpec" -> 26,
  "BlockPressureSpec" -> 26, "CuratePipelineSpec" -> 23,
  "StatsOpsSpec" -> 21, "PqDistortionSpec" -> 21,
  "IngestLoopSpec" -> 19, "AnnIndexStoreSpec" -> 19,
  "RestoreApplySpec" -> 16, "CacheBookSpec" -> 16,
  "GraphPredSpec" -> 10, "SliceTransformSpec" -> 9,
  "LshIndexStoreSpec" -> 8, "GraphUpsertSpec" -> 7,
  "KcorePeelSpec" -> 7, "MaxSimSpec" -> 7, "NearestCentroidsSpec" -> 6,
  "SnapshotSliceSpec" -> 6, "SliceBucketedSpec" -> 6, "MmrSpec" -> 6,
  "SemDedupSpec" -> 6, "BenchRetrySpec" -> 6, "SparkEntrySpec" -> 5,
  "FuzzyDedupSpec" -> 5, "BqMrlSpec" -> 5, "IvfUpsertSpec" -> 5,
  "EagerPersistSpec" -> 5, "SceneDedupSpec" -> 5, "DedupIncrementalSpec" -> 5)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  // bound each group JVM's implicit pools (GC, JIT, commonPool) to its
  // fair share of the machine — six JVMs each sizing for all cores
  // measured 31 CPU-minutes of SYS time on a 7-minute run
  val opts = ForkOptions().withRunJVMOptions(
    (Test / javaOptions).value.toVector :+ "-XX:ActiveProcessorCount=8")
  val n = sys.env.get("SPARK_GRAFT_TEST_GROUPS")
    .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(4)
  if (n <= 1 || tests.size <= 1)
    Seq(Tests.Group("all", tests, Tests.SubProcess(opts)))
  else {
    val loads = Array.fill(n)(0.0)
    val groups = Array.fill(n)(Vector.empty[TestDefinition])
    tests.map(t => t -> testSuiteWeights.getOrElse(t.name.split('.').last, 2.5))
      .sortBy { case (t, w) => (-w, t.name) } // deterministic packing
      .foreach { case (t, w) =>
        val i = loads.indexOf(loads.min)
        loads(i) += w
        groups(i) :+= t
      }
    groups.zipWithIndex.map { case (ts, i) =>
      // per-group scratch dir: concurrent block managers sharing one
      // spill/checkpoint directory contend in the kernel
      val dir = s"/tmp/graft_test_g$i"
      val gOpts = opts.withRunJVMOptions(
        opts.runJVMOptions :+ s"-Dspark.local.dir=$dir" :+ s"-Djava.io.tmpdir=$dir")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      Tests.Group(s"g$i", ts, Tests.SubProcess(gOpts))
    }.toSeq
  }
}
// sbt serializes forked test groups by default (ForkedTestGroup limit
// 1); allow the groups to actually run concurrently
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 8), Tags.limitAll(16))
