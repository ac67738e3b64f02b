package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}

/** Measurement tool (optimization guide §1): run ONE query the exact way
  * Bench does (same session, same sweep, warmup + timed iteration) with a
  * SparkListener attached, and print a per-job breakdown — job count, job
  * wall-clock, stage task-time, and the gap between query wall and
  * sum-of-job wall (= driver-side work: planning, listing, commits).
  *
  * Usage: scripts/run.sh graft.ProfileQuery <sfDir> <queryName> [iters]
  * Never part of the driver contract; purely a local profiling harness.
  */
object ProfileQuery {

  private class JobLog extends SparkListener {
    case class Job(id: Int, desc: String, start: Long, var end: Long = 0L)
    val jobs = new scala.collection.mutable.ArrayBuffer[Job]()
    val execSite = new scala.collection.mutable.HashMap[Long, String]()
    var stageTaskTimeMs = 0L
    var stageCount = 0
    override def onOtherEvent(
        event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
      event match {
        case e: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          synchronized { execSite(e.executionId) = e.description }
        case _ =>
      }
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      // Attribute the job to its root SQL execution's action callsite
      // (AQE materialization jobs inherit the root execution id), falling
      // back to the first graft.* frame in any stage's long callsite.
      val fromExec = Option(e.properties).flatMap { p =>
        Option(p.getProperty("spark.sql.execution.root.id"))
          .orElse(Option(p.getProperty("spark.sql.execution.id")))
      }.flatMap(id => execSite.get(id.toLong))
      val fromDetails = e.stageInfos.iterator
        .flatMap(_.details.split('\n'))
        .find(l => l.contains("graft.") && !l.contains("ProfileQuery"))
        .map(_.trim)
      val d = fromExec.orElse(fromDetails)
        .orElse(e.stageInfos.lastOption.map(_.name))
        .getOrElse("")
      jobs += Job(e.jobId, d, System.nanoTime())
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.find(_.id == e.jobId).foreach(_.end = System.nanoTime())
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      synchronized {
        stageCount += 1
        stageTaskTimeMs += e.stageInfo.taskMetrics.executorRunTime
      }
    def reset(): Unit = synchronized {
      jobs.clear(); stageTaskTimeMs = 0L; stageCount = 0
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val iters = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    // Same warm-up as Bench: session infra + one untimed run of the query.
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100).count()
    fn(spark, sfDir).count()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))

    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    (1 to iters).foreach { it =>
      log.reset()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // let listener events drain
      Thread.sleep(300)
      val jobWall = log.jobs.map(j => (j.end - j.start) / 1e9).sum
      println(f"[profile] $name iter=$it wall=$wall%.3f s jobs=${log.jobs.size} " +
        f"jobWall=$jobWall%.3f s stages=${log.stageCount} " +
        f"stageTaskTime=${log.stageTaskTimeMs / 1e3}%.3f s " +
        f"driverGap=${wall - jobWall}%.3f s")
      val byDesc = log.jobs.groupBy(_.desc).map { case (d, js) =>
        (d, js.size, js.map(j => (j.end - j.start) / 1e9).sum)
      }.toSeq.sortBy(-_._3)
      byDesc.take(25).foreach { case (d, n, s) =>
        val label = if (d.isEmpty) "(no description)" else d.take(110)
        println(f"[profile]   $s%8.3f s  n=$n%-4d $label")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
