package graft.tools

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

/** Stage-skew audit (r17, VERDICT item 7): run the named keys with a
  * listener recording per-stage task durations and shuffle-read
  * bytes, then print every stage whose max/median task duration
  * exceeds a threshold — the guide §2.5 skew diagnostic, scripted.
  * Dev tool, not in any query path.
  *
  * Usage: runMain graft.tools.SkewAudit <sfDir> <key>[,key...] [minRatio]
  */
object SkewAudit {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: runMain graft.tools.SkewAudit <sfDir> <key>[,key...] [minRatio]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val keys = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val minRatio = if (args.length > 2) args(2).toDouble else 2.0
    val s = GraftSession.local()
    val durs = TrieMap.empty[Int, List[(Long, Long)]] // stage -> (ms, shuffleReadBytes)
    val names = TrieMap.empty[Int, String]
    s.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val sr = if (m.shuffleReadMetrics != null)
            m.shuffleReadMetrics.totalBytesRead else 0L
          durs.updateWith(t.stageId)(prev =>
            Some((m.executorRunTime, sr) :: prev.getOrElse(Nil)))
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        names.put(e.stageInfo.stageId, e.stageInfo.name.takeWhile(_ != '\n'))
        ()
      }
    })
    keys.foreach { k =>
      durs.clear(); names.clear()
      try {
        s.sparkContext.setJobDescription(s"skewaudit: $k")
        graft.SparkEntry.queries(k)(s, sfDir)
          .write.mode("overwrite").format("noop").save()
      } catch { case NonFatal(e) =>
        System.err.println(s"[skew] $k failed: ${e.getMessage}")
      }
      println(s"[skew] == $k (stages with >=4 tasks, max/median ratio >= $minRatio)")
      durs.toSeq.sortBy(_._1).foreach { case (sid, samples) =>
        if (samples.size >= 4) {
          val ds = samples.map(_._1).sorted
          val med = math.max(1L, ds(ds.size / 2))
          val ratio = ds.last.toDouble / med
          val srTot = samples.map(_._2).sum
          val srMax = samples.map(_._2).max
          if (ratio >= minRatio)
            println(f"[skew] stage $sid%5d tasks=${samples.size}%4d " +
              f"durMax=${ds.last}%6d ms med=$med%6d ms ratio=$ratio%5.1f " +
              f"srTot=${srTot / 1024 / 1024}%5d MB srMax=${srMax / 1024 / 1024}%4d MB " +
              names.getOrElse(sid, "?").take(60))
        }
      }
    }
    s.stop()
  }
}
