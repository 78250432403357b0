package graft.tools

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: scale-up stress probe. Replicates the fixture corpora k-fold
  * (ids offset per copy; texts salted so copies are near- but not
  * exact-duplicates across replicas) and times the sketch-based operators,
  * answering "does the candidate volume stay linear?" with data instead of
  * hope.
  *
  * Usage: runMain graft.tools.ScaleProbe <sfDir> <k>
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val sfDir = args.head
    val k = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val n0 = docs0.count()
    // replica r: ids offset, text prefixed with a replica token so
    // replicas are distinct documents (prefix changes leading shingles)
    val docs = (0 until k).map { r =>
      docs0.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        concat(lit(s"r$r "), col("text")).as("text"))
    }.reduce(_ unionByName _)
    docs.write.format("noop").mode("overwrite").save()

    def t(name: String)(df: => DataFrame): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val rows = df.count()
      println(f"[scale] k=$k%-3d docs=${n0 * k}%-7d $name%-22s " +
        f"${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
    }
    t("minhash_pairs")(Dedup.lshCandidatePairs(docs, "doc_id", 16, 4))
    t("fuzzy")(Dedup.fuzzy(docs, "doc_id", 16, 4, 0.5))
    t("simhash_pairs")(
      Dedup.simhashPairs(Dedup.simhash(docs, "doc_id", "text"), 3))

    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val emb = (0 until k).map { r =>
      emb0.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)
    t("srp_neardup")(Similarity.srpNearDupPairs(emb, 8, 64, 0.35))
    t("brute_topk")(Similarity.bruteForceTopK(emb, col("vec_id") % 1000 === 0, 10))
    spark.stop()
  }
}
