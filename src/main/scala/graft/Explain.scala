package graft

/** Plan-hygiene tool: prints the formatted physical plan for one or all
  * queries, for eyeballing pushdown (`PushedFilters`, `ReadSchema`),
  * join strategies (`BroadcastHashJoin`), and `WholeStageCodegen` spans.
  *
  * Usage: runMain graft.Explain <sfDir> [q1,q2,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only = args.lift(1).map(_.split(',').toSet)
    val spark = Verify.session("graft-explain")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        println(s"\n================ $name ================")
        try println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
