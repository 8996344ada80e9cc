package graft

import graft.io.OracleTables

/** Plan-dump helper for the optimization rounds: writes
  * `df.explain("formatted")` output for selected queries to files —
  * the before/after evidence under `plans/rNN/` the optimization
  * deliverables require. Separate main so the frozen Bench/Verify
  * harnesses stay untouched.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [qNN,qNN,...]
  * Writes `<outDir>/<query>_<suffix>.txt` per selected query. Queries
  * whose operator executes eagerly during construction (q41, q81, q84,
  * q86 run multi-act/driver-coordinated work) still dump the plan of the
  * frame they RETURN; their interior job structure is documented in
  * OPTIMIZATION notes instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <suffix> [only]")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val only: Set[String] =
      if (args.length > 3) args(3).split(",").toSet else Set.empty
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    try {
      OracleTables.ensure(spark, SparkEntry.clipCount(sfDir))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (only.isEmpty || only.exists(name.startsWith)) {
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
            System.err.println(s"[plandump] wrote $name")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
        }
      }
    } finally spark.stop()
  }
}
