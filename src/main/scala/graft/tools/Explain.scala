package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and exchange-reuse stats)
  * for one or more declared queries.
  *
  * Usage: runMain graft.tools.Explain <sfDir> <queryName> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"======== $name (static plan) ========")
      df.explain("formatted")
      // run it so AQE finalizes, then show the adaptive plan
      df.write.format("noop").mode("overwrite").save()
      val finalPlan = df.queryExecution.executedPlan.toString
      println(s"-------- $name (final adaptive plan) --------")
      println(finalPlan)
      val reused = "ReusedExchange".r.findAllIn(finalPlan).length
      val exch = "Exchange".r.findAllIn(finalPlan).length
      val codegen = "WholeStageCodegen".r.findAllIn(finalPlan).length
      println(s"[explain] $name: exchanges=$exch reused=$reused wholeStageCodegenSpans=$codegen")
    }
    spark.stop()
  }
}
