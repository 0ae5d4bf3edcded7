package graft

/** Informational audit: per registry query, the number of
  * whole-stage-codegen subtrees in the compiled plan (CodegenMode's
  * "Found N WholeStageCodegen subtrees" header). AQE is disabled for
  * the explain — under AQE the pre-execution codegen explain reports
  * 0 subtrees for every adaptive plan, which is how PlanSpec's old
  * contains("WholeStageCodegen") assertion turned vacuous (the header
  * contains the literal even at 0). Run:
  * sbt "Test/runMain graft.CodegenAudit" */
object CodegenAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val sfDir = "/root/testdata/sf0.001"
    val re = "Found (\\d+) WholeStageCodegen subtrees".r
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.CodegenMode)
        val n = re.findFirstMatchIn(p).map(_.group(1)).getOrElse("?")
        println(s"CGAUDIT $name $n")
        graft.core.Caches.drain(spark)
      } catch { case e: Throwable =>
        println(s"CGAUDIT $name ERROR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
