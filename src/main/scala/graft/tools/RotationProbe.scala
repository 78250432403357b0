package graft.tools

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: prefix-dimension recall ladder for the trained-rotation
  * family (plain truncation vs variance-descending permutation vs dense
  * PCA rotation) — the measurement behind the BASELINE.md matryoshka
  * rows and the adopt/reject gate of r17.
  *
  * Usage: runMain graft.tools.RotationProbe <sfDir>
  */
object RotationProbe {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", graft.Bench.scratchDir())
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = Tables.embeddings(spark, sfDir)
    val exact = Similarity.bruteForceTopK(e, col("vec_id") % 100 === 0, k = 10)
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    def meanRecall(emb: DataFrame, d: Int): Double =
      Similarity.recallAtK(
          Similarity.bruteForceTopK(
            emb.select(col("vec_id"),
              slice(col("embedding"), 1, d).as("embedding")),
            col("vec_id") % 100 === 0, k = 10),
          exact, k = 10)
        .agg(avg(col("recall"))).head().getDouble(0)
    val rot = Similarity.rotate(e, Similarity.pcaRotation(e, 64))
      .localCheckpoint(true, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val perm = Similarity.varianceOrder(e, 64)
    val permuted = e.select(col("vec_id"),
      array(perm.toIndexedSeq.map(i => col("embedding").getItem(i)): _*)
        .as("embedding"))
    for (d <- Seq(8, 16, 32, 48)) {
      println(f"[rotation] $sfDir d=$d%2d recall@10: " +
        f"plain=${meanRecall(e, d)}%.3f " +
        f"perm=${meanRecall(permuted, d)}%.3f " +
        f"pca=${meanRecall(rot, d)}%.3f")
    }
    spark.stop()
  }
}
