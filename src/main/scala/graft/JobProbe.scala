package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev measurement aid (optimization guide §1): per-query execution
  * forensics — seconds (best of 2), job/stage/task counts and total
  * shuffle read/write bytes, via a SparkListener around each run.
  * Attributes a slow row to scheduling floor (many tiny stages),
  * shuffle volume, or compute before any code is touched.
  * `runMain graft.JobProbe <dir> [names…]`. Not part of the driver
  * contract.
  */
object JobProbe {
  private class Counters extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    val spill = new AtomicLong
    // SPARK_GRAFT_JOBPROBE_DETAIL=1: per-stage (name, tasks) lines so a
    // task-heavy row can be attributed to its exact stages
    val detail = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks)
      detail.add(s"${s.stageInfo.numTasks}\t${s.stageInfo.name.take(120)}")
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.diskBytesSpilled)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    Scratch.sweepStale()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", Scratch.sparkLocalDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"""{"job_probe":{"name":${JsonUtil.jstr(n)},"error":"unknown query"}}""")
        case Some(fn) =>
          def once(): (Double, Counters) = {
            val c = new Counters
            spark.sparkContext.addSparkListener(c)
            val t0 = System.nanoTime()
            try fn(spark, dir).write.format("noop").mode("overwrite").save()
            finally {
              // drain queued listener events so the counters are complete
              // (listenerBus is private[spark]; the accessor is public at
              // the bytecode level, so reflection reaches it)
              // r18 ADVICE: waitUntilEmpty's signature varies across
              // Spark lines (no-arg vs (timeoutMillis: Long)) — try
              // both before falling back, and SAY when the fallback
              // sleep ran (it can undercount late stage events, and
              // probe numbers drive optimization decisions)
              try {
                val bus = spark.sparkContext.getClass
                  .getMethod("listenerBus").invoke(spark.sparkContext)
                try bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
                catch {
                  case _: NoSuchMethodException =>
                    bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
                      .invoke(bus, java.lang.Long.valueOf(10000L))
                }
              } catch {
                case _: Throwable =>
                  System.err.println(
                    "[job_probe] listener-bus drain unavailable; " +
                      "falling back to sleep(300) — counters may " +
                      "undercount late stage events")
                  Thread.sleep(300)
              }
              spark.sparkContext.removeSparkListener(c)
            }
            ((System.nanoTime() - t0) / 1e9, c)
          }
          try {
            val (t1, c1) = once()
            val (t2, c2) = once()
            // counters from the FASTER attempt (shared-frame builds land
            // in attempt 1; attempt 2 is the steady-state shape)
            val (t, c) = if (t2 <= t1) (t2, c2) else (t1, c1)
            println(f"""{"job_probe":{"name":"$n","sec":$t%.3f,"sec_other":${math.max(t1, t2)}%.3f,"jobs":${c.jobs.get},"stages":${c.stages.get},"tasks":${c.tasks.get},"shuf_read_mb":${c.shuffleRead.get / 1e6}%.1f,"shuf_write_mb":${c.shuffleWrite.get / 1e6}%.1f,"spill_mb":${c.spill.get / 1e6}%.1f}}""")
            if (sys.env.get("SPARK_GRAFT_JOBPROBE_DETAIL").contains("1"))
              c.detail.forEach(l => println(s"[stage] $l"))
          } catch {
            case e: Throwable => println(s"""{"job_probe":{"name":${JsonUtil.jstr(n)},"error":${JsonUtil.jstr(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))}}}""")
          }
      }
    }
    spark.stop()
  }
}
