package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool (round 18): dump `.explain("formatted")` for named queries
  * into per-query files — the before/after plan evidence for
  * optimization rounds. Not part of the driver contract.
  *
  * Run: sbt "runMain graft.PlanDump <outDir> <suffix> <q1,q2,...>"
  * (files land as `<outDir>/<query>_<suffix>.txt`).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...>")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", EngineConf.MaxPartitionBytes)
      .config("spark.sql.cteRecursionRowLimit", EngineConf.CteRecursionRowLimit)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    names.foreach { name =>
      val body = try {
        QueryRegistry.queries(name)(spark, sf)
          .queryExecution.explainString(ExplainMode.fromString("formatted"))
      } catch { case t: Throwable => s"ERROR building plan: ${t.getMessage}\n" }
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        body.getBytes("UTF-8"))
      println(s"[plandump] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
