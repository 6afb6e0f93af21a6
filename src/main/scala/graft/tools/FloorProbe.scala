package graft.tools

import graft.GraftSession
import scala.util.control.NonFatal

/** Where does a fast key's ~0.4 s go? (r17, VERDICT item 2)
  *
  * For each named key, in one warm session: split per-rep time into
  * ANALYZE+PLAN (force queryExecution.executedPlan) vs EXECUTE (noop
  * save of the planned frame), min over reps. Then replay the same
  * split under candidate session-conf variations (runtime-settable
  * ones only) to see which global knob moves the floor. Dev tool —
  * not in any query path.
  *
  * Usage: runMain graft.tools.FloorProbe <sfDir> <key>[,key...] [reps]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: runMain graft.tools.FloorProbe <sfDir> <key>[,key...] [reps]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val keys = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 5
    val s = GraftSession.local()

    def one(name: String): (Double, Double) = {
      val fn = graft.SparkEntry.queries(name)
      var bestPlan = Double.MaxValue
      var bestExec = Double.MaxValue
      (1 to reps).foreach { _ =>
        try {
          val t0 = System.nanoTime()
          val df = fn(s, sfDir)
          df.queryExecution.executedPlan // force analysis+optimization+planning
          val t1 = System.nanoTime()
          df.write.mode("overwrite").format("noop").save()
          val t2 = System.nanoTime()
          bestPlan = math.min(bestPlan, (t1 - t0) / 1e9)
          bestExec = math.min(bestExec, (t2 - t1) / 1e9)
        } catch { case NonFatal(e) =>
          System.err.println(s"[floor] $name failed: ${e.getMessage}")
        }
      }
      (bestPlan, bestExec)
    }

    def sweep(tag: String): Unit = {
      var sumP = 0.0; var sumE = 0.0
      keys.foreach { k =>
        val (p, e) = one(k)
        println(f"[floor:$tag] $k%-24s plan ${p}%6.3f  exec ${e}%6.3f")
        sumP += p; sumE += e
      }
      println(f"[floor:$tag] TOTAL plan ${sumP}%7.3f  exec ${sumE}%7.3f")
    }

    // warm pass (JIT + codegen cache), then the measured baseline
    keys.foreach(k =>
      try graft.SparkEntry.queries(k)(s, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case NonFatal(_) => () })
    sweep("base")

    // candidate conf variations, runtime-settable; restore after each
    val variations: Seq[(String, Map[String, String])] = Seq(
      "aqe_off" -> Map("spark.sql.adaptive.enabled" -> "false"),
      "shuf8" -> Map("spark.sql.shuffle.partitions" -> "8"),
      "aqe_off_shuf8" -> Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8"),
      "no_bcast_to" -> Map("spark.sql.broadcastTimeout" -> "3600"),
      "cbo_cache" -> Map(
        "spark.sql.execution.reuseSubquery" -> "true"))
    variations.foreach { case (tag, confs) =>
      val saved = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      sweep(tag)
      saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
    s.stop()
  }
}
