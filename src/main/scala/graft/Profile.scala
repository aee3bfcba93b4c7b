package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract): times the named
  * queries exactly like Bench (min-of-2, max-xxhash64 action) while a
  * listener attributes executor task time, job count and stage count to each
  * query. Wall >> task/cores means driver-side planning/scheduling dominates;
  * task-heavy stages point at the data-plane work worth optimizing.
  * Usage: runMain graft.Profile <query...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Profile <query...>")
    val names = args.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // experiment hook: GRAFT_PROFILE_CONF="k1=v1;k2=v2"
    sys.env.get("GRAFT_PROFILE_CONF").foreach(_.split(';').filter(_.nonEmpty)
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // per-description accumulation
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    val gcTimeMs = new java.util.concurrent.atomic.AtomicLong
    val shufWrite = new java.util.concurrent.atomic.AtomicLong
    val shufRead = new java.util.concurrent.atomic.AtomicLong
    val verbose = sys.env.contains("GRAFT_PROFILE_STAGES")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (verbose) {
          val i = s.stageInfo
          val tt = i.taskMetrics.executorRunTime
          if (tt > 500) println(
            f"STAGE ${i.stageId}%4d tasks=${i.numTasks}%4d taskT=${tt / 1000.0}%7.1fs ${i.name.take(120)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          gcTimeMs.addAndGet(m.jvmGCTime)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })

    // warmup like Bench
    try Tables.nation(spark, sfDir).groupBy("n_regionkey").count().count()
    catch { case _: Throwable => () }

    def snap(): (Long, Long, Long, Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, taskTimeMs.get, gcTimeMs.get,
        shufWrite.get, shufRead.get)

    SparkEntry.registry.filter(q => names(q.name)).foreach { q =>
      def timeOnce(): Double = {
        val t0 = System.nanoTime()
        val df = q.build(spark, sfDir)
        import org.apache.spark.sql.functions.{max, xxhash64}
        df.agg(max(xxhash64(df.columns.map(df.col): _*))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val b0 = snap()
      val s1 = timeOnce()
      val b1 = snap()
      val s2 = timeOnce()
      val b2 = snap()
      def d(a: (Long, Long, Long, Long, Long, Long, Long),
            b: (Long, Long, Long, Long, Long, Long, Long)) =
        (b._1 - a._1, b._2 - a._2, b._3 - a._3, b._4 - a._4, b._5 - a._5,
          b._6 - a._6, b._7 - a._7)
      val r1 = d(b0, b1); val r2 = d(b1, b2)
      println(f"PROF ${q.name}%-28s run1 ${s1}%6.2fs jobs=${r1._1}%3d stages=${r1._2}%4d tasks=${r1._3}%5d taskT=${r1._4 / 1000.0}%7.1fs gc=${r1._5 / 1000.0}%5.1fs sw=${r1._6 / 1048576}%5dMB sr=${r1._7 / 1048576}%5dMB")
      println(f"PROF ${q.name}%-28s run2 ${s2}%6.2fs jobs=${r2._1}%3d stages=${r2._2}%4d tasks=${r2._3}%5d taskT=${r2._4 / 1000.0}%7.1fs gc=${r2._5 / 1000.0}%5.1fs sw=${r2._6 / 1048576}%5dMB sr=${r2._7 / 1048576}%5dMB")
    }
    println("PROFILE_DONE")
    spark.stop()
  }
}
