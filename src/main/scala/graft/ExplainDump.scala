package graft

/** Dump `.explain("formatted")` for registered queries to files — the
  * judge-checkable plan evidence for optimization rounds
  * (plans/rNN/<query>_{before,after}.txt). Building the DataFrame for a
  * lifecycle gate executes its workflow side effects; the dumped plan is
  * the gate's RESULT read, which is still where the declared columns'
  * provenance shows (scan shapes, join strategies, exchanges).
  *
  * Usage: EXPLAIN_DUMP=q05_revenue_by_region[,...] EXPLAIN_SUFFIX=before
  *   EXPLAIN_DIR=plans/r15 java ... graft.ExplainDump
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("EXPLAIN_DUMP", "")
      .split(',').map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "set EXPLAIN_DUMP to a comma-separated query list")
    val suffix = sys.env.getOrElse("EXPLAIN_SUFFIX", "after")
    val dir = sys.env.getOrElse("EXPLAIN_DIR", "plans/r15")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val spark = Sessions.local()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/${name}_$suffix.txt"), txt)
      println(s"wrote $dir/${name}_$suffix.txt (${txt.length} chars)")
      spark.catalog.clearCache()
      graft.operators.BookCache.clear()
      graft.util.TempDirs.sweep()
    }
    spark.stop()
  }
}
