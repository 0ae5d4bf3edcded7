package graft

/** One-off audit: prints `name exchanges nestedLoop cartesian` for every
  * registry query so PlanBudgetSpec's table can be pinned from measured
  * reality (and drift investigated). Run:
  *   sbt "Test/runMain graft.PlanAudit"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sfDir = "/root/testdata/sf0.001"
    val shuffleRe = "(?<!Broadcast)Exchange ".r
    // optional arg: comma-separated query subset
    val subset = args.headOption.map(_.split(",").toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val ex = shuffleRe.findAllIn(p).size
        val bnl = p.contains("BroadcastNestedLoopJoin")
        val cart = p.contains("CartesianProduct")
        println(f"AUDIT $name%-28s ex=$ex%-3d bnl=$bnl%-5s cart=$cart")
      } catch {
        case e: Throwable => println(s"AUDIT $name ERROR ${e.getMessage}")
      } finally graft.core.Caches.drain(spark)
    }
    spark.stop()
  }
}
