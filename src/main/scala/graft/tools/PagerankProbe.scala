package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Stage split for q_pagerank: edge-build cost vs per-iteration cost
  * (iters=1 vs iters=10 on the same warmed input). Dev tool. */
object PagerankProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local()
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pr] $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val li = Tables.load(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val ord = Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    def dirs = {
      val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
        .distinct()
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    }
    // warm IO
    timed("warm scan")(dirs.write.format("noop").mode("overwrite").save())
    for (it <- Seq(1, 5, 10); rep <- 1 to 2)
      timed(s"pagerank it=$it r$rep") {
        Graph.pagerank(dirs, iters = it)
          .write.format("noop").mode("overwrite").save()
      }
    s.stop()
  }
}
