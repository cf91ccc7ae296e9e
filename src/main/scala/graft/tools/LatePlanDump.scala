package graft.tools
object LatePlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    val df = graft.operators.DiagnosticsQueries.qLatenessAudit(spark, "/root/testdata/sf0.001")
    df.collect()
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/lateplan.txt"),
      df.queryExecution.executedPlan.toString.getBytes)
    spark.stop()
  }
}
