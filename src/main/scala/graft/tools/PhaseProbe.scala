package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Where does a query's wall time go? For each named query: total wall per
 * rep (bench methodology: fresh DataFrame per rep, .count() action) split
 * into Catalyst phases (QueryPlanningTracker: analysis / optimization /
 * physical planning) vs execution. Guides §1 "measure first": at bench
 * scale many plans are driver-bound, and this probe adjudicates
 * plan-complexity work vs executor work per query.
 *
 *   tools/run_main.sh graft.tools.PhaseProbe <sfDir> <q1,q2,...> [reps]
 */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.registerAll(spark)
    graft.queries.Warmup.warmAll(spark, sfDir)
    val warmed = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def evict(): Unit = {
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!warmed.contains(id)) rdd.unpersist(blocking = false)
      }
      System.gc()
    }
    // per-job wall times: jobs >= 50 ms get a line (jobId, dur, ntasks)
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobTasks = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val jobDesc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobStart.put(j.jobId, System.nanoTime())
          jobTasks.put(j.jobId,
            j.stageInfos.map(_.numTasks).sum)
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          jobDesc.put(j.jobId, desc.take(90))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          // a job not seen by onJobStart (listener attached mid-job) would
          // null-unbox to epoch 0 and print a garbage multi-decade duration
          Option(jobStart.remove(j.jobId)).foreach { t0 =>
            val d = (System.nanoTime() - t0) / 1e9
            if (d >= 0.05)
              println(f"    job ${j.jobId}%5d ${d}%6.3f s tasks=${jobTasks.remove(j.jobId)} ${jobDesc.remove(j.jobId)}")
          }
        }
      })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        evict()
        // cumulative janino compile time before this rep (ms): attributes
        // whole-stage-codegen compilation cost per rep
        val cg0 = org.apache.spark.metrics.source.CodegenMetrics
          .METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
        val cgN0 = org.apache.spark.metrics.source.CodegenMetrics
          .METRIC_COMPILATION_TIME.getCount
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)          // build (includes analysis + any
        val tBuild = System.nanoTime()     //   driver work inside the query fn)
        df.queryExecution.executedPlan     // force optimization + planning
        val tPlan = System.nanoTime()
        df.count()                         // the bench's timed action
        val tDone = System.nanoTime()
        val phases = df.queryExecution.tracker.phases
        val ph = phases.toSeq.sortBy(_._1).map { case (k, v) =>
          f"$k=${(v.endTimeMs - v.startTimeMs) / 1e3}%.3f"
        }.mkString(" ")
        val cg1 = org.apache.spark.metrics.source.CodegenMetrics
          .METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
        val cgN1 = org.apache.spark.metrics.source.CodegenMetrics
          .METRIC_COMPILATION_TIME.getCount
        println(f"$name rep$rep wall=${(tDone - t0) / 1e9}%.3f " +
          f"build=${(tBuild - t0) / 1e9}%.3f " +
          f"plan=${(tPlan - tBuild) / 1e9}%.3f " +
          f"exec=${(tDone - tPlan) / 1e9}%.3f " +
          f"codegen=${(cg1 - cg0) / 1e3}%.3f/n=${cgN1 - cgN0}  $ph")
      }
    }
    spark.stop()
  }
}
