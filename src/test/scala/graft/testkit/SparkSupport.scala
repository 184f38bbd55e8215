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

trait SparkSupport {
  lazy val spark: SparkSession = SparkSupport.spark

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
