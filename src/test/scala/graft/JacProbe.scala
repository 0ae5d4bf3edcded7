package graft
import org.apache.spark.sql.functions._
object JacProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_scale_x5")) {
      val docs = graft.core.Tables.documents(spark, dir)
      val bd = graft.llm.Dedup.bandsNative(docs, "doc_id", "text").cache()
      val nb = bd.count()
      // band bucket occupancy
      val occ = bd.groupBy("b", "v").count()
      val big = occ.orderBy(col("count").desc).limit(5).collect().map(_.getLong(2)).toSeq
      val pairs = occ.select(sum(col("count") * (col("count") - 1) / 2)).head.get(0)
      val cand = graft.llm.Dedup.minhashCandidates(docs, "doc_id", "text").count()
      println(s"JPROBE $dir bands=$nb bucketPairs=$pairs distinctCand=$cand top5=$big")
      graft.core.Caches.drain(spark)
    }
    spark.stop()
  }
}
