package graft.util

import org.apache.spark.sql.SparkSession

/** Job-description labels for multi-action lifecycle bodies (guide §1.5):
  * the streaming/workflow operators run a dozen Spark jobs per step or
  * micro-batch, and with every job inheriting the stream's call site the
  * UI (and the GateProbe listener) cannot say which phase the wall went
  * to. `setJobDescription` is thread-local, so labeling inside a
  * foreachBatch body or a workflow step labels exactly that phase's jobs.
  */
object Jobs {
  def labeled[A](spark: SparkSession, label: String)(body: => A): A = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(label)
    try body finally sc.setJobDescription(prev)
  }
}
