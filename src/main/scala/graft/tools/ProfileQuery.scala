package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.{Engine, SparkEntry}

/** Dev profiling harness for ONE declared query: runs it `reps` times
  * against the bench's noop sink and prints, per run, the wall time split
  * into plan-construction vs execution, plus the Spark job count and the
  * per-job / per-stage wall breakdown of the LAST run — so a slow query
  * can be attributed to driver-side planning, job-count overhead (many
  * tiny actions), or one hot stage, before touching any code.
  *
  * Usage: dev/run.sh graft.tools.ProfileQuery <query> [reps] [sfDir]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val sfDir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf experiments: SPARK_GRAFT_CONF="k=v;k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    Engine.tune(spark)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv => val Array(k, v) = kv.split("=", 2)
        try spark.conf.set(k, v) catch { case _: Throwable => () } })
    spark.sparkContext.setLogLevel("WARN")

    case class JobRec(id: Int, desc: String, start: Long, var end: Long = 0L,
        var stages: List[(Int, String, Long)] = Nil)
    val jobs = new scala.collection.mutable.ArrayBuffer[JobRec]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.synchronized {
        jobs += JobRec(j.jobId,
          Option(j.properties.getProperty("spark.job.description")).getOrElse(""),
          j.time)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_.id == j.jobId).foreach(_.end = j.time)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val info = s.stageInfo
        val wall = (for {a <- info.completionTime; b <- info.submissionTime} yield a - b).getOrElse(-1L)
        if (jobs.nonEmpty)
          jobs.last.stages ::= ((info.stageId,
            s"tasks=${info.numTasks} " + info.name.takeWhile(_ != '\n').take(60), wall))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // SPARK_GRAFT_FINALPLAN=1: print the post-AQE executed plan of the
    // last noop write (shows runtime exchange/stage reuse).
    if (sys.env.get("SPARK_GRAFT_FINALPLAN").contains("1"))
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          println("[pq-finalplan]\n" + qe.executedPlan.toString)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
      })

    val fn = SparkEntry.queries(name)
    // the bench's warm pass
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings", "events").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    (1 to reps).foreach { i =>
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      Thread.sleep(150) // let the listener bus drain
      val (njobs, jobWall) = jobs.synchronized {
        (jobs.size, jobs.map(j => math.max(0L, j.end - j.start)).sum)
      }
      println(f"[pq] $name run$i: total ${(t2 - t0) / 1e9}%7.3f s  construct ${(t1 - t0) / 1e9}%6.3f  exec ${(t2 - t1) / 1e9}%7.3f  jobs $njobs%3d  jobWall ${jobWall / 1e3}%7.3f s")
      if (i == reps) jobs.synchronized {
        jobs.foreach { j =>
          println(f"[pq]   job ${j.id}%4d ${(j.end - j.start) / 1e3.toDouble}%8.3f s  ${j.desc.take(50)}")
          j.stages.reverse.foreach { case (sid, nm, w) =>
            println(f"[pq]     stage $sid%4d ${w / 1e3.toDouble}%8.3f s  $nm")
          }
        }
      }
    }
    spark.stop()
  }
}
