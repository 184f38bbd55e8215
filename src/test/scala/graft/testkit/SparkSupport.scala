package graft.testkit

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed suites (forked sbt test
  * JVM). Small core count — these tests verify semantics, not throughput.
  */
object SparkSupport {
  lazy val spark: SparkSession = {
    val s = graft.Sessions.builder("local[4]", "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSupport extends org.scalatest.BeforeAndAfterAll { this: org.scalatest.Suite =>
  lazy val spark: SparkSession = SparkSupport.spark

  /** Registered with the global TempDirs registry, so the forked test
    * JVM's shutdown hook sweeps fixture dirs when the run ends. */
  def tmpDir(prefix: String): String = graft.util.TempDirs.scratch(prefix)

  /** Cache-hygiene gate (VERDICT r6 item 7): a suite must leave the
    * shared session's CacheManager EMPTY — operators with internal
    * persists either release them (managed / WithRelease forms) or the
    * test clears explicitly, mirroring the Verify/Bench harness
    * contract. This assertion makes a future operator that persists
    * without a release path fail CI instead of silently accumulating
    * MEMORY_AND_DISK blocks across the suite run (the r5 leak class).
    */
  override protected def afterAll(): Unit = {
    try {
      val leaked = !spark.sharedState.cacheManager.isEmpty
      if (leaked) {
        spark.catalog.clearCache() // don't poison the suites that follow
        throw new IllegalStateException(
          s"${getClass.getSimpleName} left persisted frames in the CacheManager — " +
            "release operator persists (managed/WithRelease forms) or clearCache in the test")
      }
    } finally super.afterAll()
  }
}
