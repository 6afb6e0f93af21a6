package graft.tools

import graft.GraftSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool for the optimization rounds: write the FULL
  * `.explain("formatted")` output of the named queries to
  * `<outDir>/<key>_<tag>.txt` — the before/after plan evidence the
  * optimization judge checks claims against (plans/r16/...).
  *
  * Usage: runMain graft.tools.PlanFiles <outDir> <tag> <sfDir> <key>[,key...]
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: runMain graft.tools.PlanFiles <outDir> <tag> <sfDir> <key>[,key...]")
      sys.exit(2)
    }
    val Array(outDir, tag, sfDir, keys) = args.take(4)
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    keys.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), plan)
      println(s"[planfiles] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
