package graft.tools

import graft.GraftSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev probe: print the formatted plan of one SparkEntry query.
  * Usage: runMain graft.tools.PlanProbe <queryName> [sfDir] */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.local()
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(s"==== $name ====")
    println(df.queryExecution.explainString(FormattedMode)
      .linesIterator.takeWhile(!_.trim.startsWith("(1)")).mkString("\n"))
    spark.stop()
  }
}
