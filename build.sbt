ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "olapxtrctrspark"
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
  // 16g default: at 8g the full 135-query bench is GC-bound — the session
  // artifact layer's working set (persisted shingle/signature/posting
  // tables) plus shuffle state thrashes old-gen and every query pays a
  // diffuse ~25% tax (measured round 6: warm total 96.7s at 8g vs 72.8s
  // at 16g, same code). The machine has 128 GiB; SPARK_DRIVER_MEM still
  // overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // r12: the 278-query registry compiles thousands of generated classes
  // (codegen cache 6000 entries × multi-method classes); the JDK-17
  // default 240 MB ReservedCodeCacheSize can fill mid-suite, after
  // which the JIT DISABLES ITSELF and every later query runs
  // interpreted — observed as warm passes 2-3 running ~1.8× slower
  // than pass 1 uniformly across unrelated queries. 512 MB holds the
  // suite's compiled working set.
  "-XX:ReservedCodeCacheSize=512m",
)
