package graft

/** Plan-hygiene tool: prints the formatted physical plan for one or all
  * queries, for eyeballing pushdown (`PushedFilters`, `ReadSchema`),
  * join strategies (`BroadcastHashJoin`), and `WholeStageCodegen` spans.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only = args.lift(1)
    val spark = Verify.session("graft-explain")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_ == n) }
      .foreach { case (name, fn) =>
        println(s"\n================ $name ================")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
