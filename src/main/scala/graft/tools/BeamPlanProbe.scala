package graft.tools

import graft.GraftSession
import graft.operators.{Pipeline, Similarity}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Plan evidence for the beam-search ROUND BODY (r17): the graph-ANN
  * query fns materialize eagerly, so their final plans are degenerate
  * checkpoint scans and PlanFiles can't show the per-round join
  * shape. This dumps the UNCUT two-round search plan (cut=false keeps
  * the whole round tree in one plan) over the persisted "base" graph
  * index — the exact join/window shape every beam round pays. Dev
  * tool, not in any query path.
  *
  * Usage: runMain graft.tools.BeamPlanProbe <outFile> <sfDir>
  */
object BeamPlanProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: runMain graft.tools.BeamPlanProbe <outFile> <sfDir>")
      sys.exit(2)
    }
    val (outFile, dir) = (args(0), args(1))
    val s = GraftSession.local()
    val emb = graft.Tables.load(s, dir, "embeddings")
    val (graph, _, entry, _, _) = Pipeline.graphIndexStore(s, dir, "base")
    val queries = emb.filter(col("vec_id") < 10)
    val df = Similarity.graphSearchTopKFrom(
      emb, queries, graph, "embedding", "vec_id",
      queries.select(col("vec_id").as("query_id"), lit(entry).as("cand")),
      k = 5, beam = 16, rounds = 2, cut = false)
    val plan = df.queryExecution.explainString(FormattedMode)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), plan)
    println(s"[beamplan] wrote $outFile (${plan.linesIterator.size} lines)")
    s.stop()
  }
}
