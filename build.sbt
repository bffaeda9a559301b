ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "projspark"
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
// Heap policy: FIXED size (Xms=Xmx) and clamped to [4g, 16g] even when
// SPARK_DRIVER_MEM asks for more.  Measured on this workload (sf0.1
// bench, local[32]): a ~90g heap lets G1 eden balloon and the
// allocation-heavy iterative jobs (knn ladder, minhash dedup) pay
// first-touch page-zeroing + GC variance — reps spread 8.8-34.6 s at 90g
// vs 5.5-6.9 s at 8g on the same commit.  Nothing in this suite needs
// more than a few GB of driver heap; a bigger heap only adds variance.
val graftHeap: String = {
  val asked = sys.env.get("SPARK_DRIVER_MEM")
    .flatMap(s => "(?i)^(\\d+)g$".r.findFirstMatchIn(s.trim).map(_.group(1).toInt))
    .getOrElse(8)
  s"${math.max(4, math.min(asked, 16))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xms$graftHeap", s"-Xmx$graftHeap",
)
