package graft.tools

import graft.{GraftSession, SparkEntry}

/** Throwaway plan-audit harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_agg", "q3_shipping", "q5_local", "k_projection",
      "k_filter_offset", "k_filter_time", "k_join_dim", "q_broadcast_join")
    for (n <- names) {
      println(s"########## $n ##########")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
