package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/**
 * Dumps `.explain("formatted")` for named queries to files — the
 * before/after plan evidence the optimization rounds commit under
 * plans/r{N}/. Session config mirrors [[graft.Bench]] (same master,
 * shuffle partitions, maxPartitionBytes, AQE) so the captured plans are
 * the plans the bench actually times, not a differently-sized twin.
 *
 *   sbt "runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]"
 *
 * With no query list, dumps every SparkEntry query. Plans are the
 * pre-execution formatted plans (AdaptiveSparkPlan isFinalPlan=false);
 * deterministic per build, independent of host speed.
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerAll(spark)
    graft.queries.Warmup.warmAll(spark, sfDir)
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
            Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
              s"FAILED: ${e.getClass.getName}: ${e.getMessage}\n")
        }
      }
    spark.stop()
  }
}
