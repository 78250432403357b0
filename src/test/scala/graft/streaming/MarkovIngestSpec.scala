package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The stitched streaming transition matrix must equal the batch rule
  * over everything ingested when ingestion is event-time ordered per
  * user — INCLUDING the cross-epoch boundary transitions no single
  * batch sees — and the audit must flag ordering violations.
  */
class MarkovIngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  // 3 users × 9 ordered events each, types cycling differently per user
  private def rows: Seq[(Long, Long, String, Timestamp)] = {
    val types = Seq("view", "click", "purchase")
    for {
      u <- 1L to 3L
      i <- 0 until 9
    } yield (u, u * 100 + i, types(((i + u) % 3).toInt), ts(i * 3))
  }

  private def batchMatrix = {
    val ev = rows.toDF("user_id", "event_id", "event_type", "ts")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("tsec"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tsec"), col("event_id"))
    val trans = ev.withColumn("nt", lead(col("event_type"), 1).over(w))
      .filter(col("nt").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("nt").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = trans.groupBy(col("from_type")).agg(sum(col("n")).as("nf"))
    trans.join(tot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("nf"), 6).as("p"))
      .collect().map(_.toSeq).toSet
  }

  test("stitched stream equals batch, boundaries included") {
    implicit val ctx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_mkv_").toString
    val input = MemoryStream[(Long, Long, String, Timestamp)]
    val q = MarkovIngest.start(
      input.toDF().toDF("user_id", "event_id", "event_type", "ts"),
      s"$tmp/store", s"$tmp/ckpt")
    try {
      // time-ordered chunks: each epoch holds a time slice of all users
      rows.sortBy(_._4.getTime).grouped(9).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = MarkovIngest.report(spark, s"$tmp/store")
      .collect().map(_.toSeq).toSet
    assert(streamed == batchMatrix && batchMatrix.nonEmpty)
    // a user's per-epoch transitions alone cannot produce this: the
    // within-epoch relation must be STRICTLY smaller than the total
    val withinOnly = spark.read.parquet(s"$tmp/store/trans")
      .agg(sum(col("n"))).head.getLong(0)
    assert(withinOnly < 3 * 8) // 8 transitions per user in the batch
    assert(MarkovIngest.orderViolations(spark, s"$tmp/store").count() == 0)
  }

  test("replay cannot double-count; a disordered epoch is flagged") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mkv2_").toString
    val chunks = rows.sortBy(_._4.getTime).grouped(9).toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      MarkovIngest.ingestBatch(
        c.toDF("user_id", "event_id", "event_type", "ts"),
        s"$tmp/store", i.toLong)
    }
    MarkovIngest.ingestBatch(
      chunks.head.toDF("user_id", "event_id", "event_type", "ts")
        .repartition(5), s"$tmp/store", 0L)
    val streamed = MarkovIngest.report(spark, s"$tmp/store")
      .collect().map(_.toSeq).toSet
    assert(streamed == batchMatrix)
    // compact: replay-dedup fixpoint of trans AND edges, invisible to
    // the stitched report, epoch structure preserved
    val rawBefore = spark.read.parquet(s"$tmp/store/trans").count() +
      spark.read.parquet(s"$tmp/store/edges").count()
    MarkovIngest.compact(spark, s"$tmp/store")
    assert(spark.read.parquet(s"$tmp/store/trans").count() +
      spark.read.parquet(s"$tmp/store/edges").count() < rawBefore,
      "replayed epoch rows should collapse")
    assert(spark.read.parquet(s"$tmp/store/edges")
      .select("epoch_id").distinct().count() == chunks.size)
    assert(MarkovIngest.report(spark, s"$tmp/store")
      .collect().map(_.toSeq).toSet == batchMatrix,
      "compact changed the stitched report")
    // now an epoch that time-travels BEFORE the last one: audited loudly
    MarkovIngest.ingestBatch(
      Seq((1L, 999L, "view", ts(0))).toDF("user_id", "event_id",
        "event_type", "ts"), s"$tmp/store", 10L)
    val v = MarkovIngest.orderViolations(spark, s"$tmp/store").collect()
    assert(v.length == 1 && v.head.getLong(0) == 1L)
  }
}
