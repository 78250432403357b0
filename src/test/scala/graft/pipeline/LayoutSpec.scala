package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits (Morton order)") {
    val got = Seq((0, 0), (1, 0), (0, 1), (1, 1), (3, 5), (255, 255))
      .toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), 8).as("z"))
      .as[Long].collect().toSeq
    // z(3,5): x=011 y=101 -> bits 0(x),1(y),2(x),5(y) -> 1+2+4+32 = 39
    assert(got == Seq(0L, 1L, 2L, 3L, 39L, 65535L))
  }

  test("z-order bounds BOTH dimensions per file; single-column sort only one") {
    val n = 20000
    // independent uniform dims — worst case for any single-column sort
    val df = spark.range(n).select(
      (col("id") * 48271 % 256).cast("int").as("x"),
      (col("id") * 69621 % 256).cast("int").as("y"))
    val zPath = graft.queries.ParityQueries.scratch("layout_z")
    val linPath = graft.queries.ParityQueries.scratch("layout_lin")
    Layout.zorderWrite(spark, df, zPath, "x", "y", bits = 8, numFiles = 16)
    Pipeline.atomicOverwrite(spark,
      df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x")),
      linPath)

    def extents(path: String): (Double, Double) = {
      val r = Layout.fileBoxes(spark, path, "x", "y")
        .agg(avg((col("x_max") - col("x_min") + 1) / 256.0),
          avg((col("y_max") - col("y_min") + 1) / 256.0))
        .collect().head
      (r.getDouble(0), r.getDouble(1))
    }
    val (zx, zy) = extents(zPath)
    val (lx, ly) = extents(linPath)
    // linear: x tightly bounded, y spans ~everything
    assert(lx < 0.2, s"x-sorted files should bound x, got $lx")
    assert(ly > 0.9, s"x-sorted files cannot bound y, got $ly")
    // z: BOTH bounded — each file is a curve tile, not a full-range slab
    assert(zx < 0.6 && zy < 0.6,
      s"z files must bound both dims, got x=$zx y=$zy")
    assert(zx + zy < lx + ly,
      s"z total extent ($zx+$zy) must beat single-column ($lx+$ly)")
    // layout never changes content
    assert(spark.read.parquet(zPath).count() == n)
    assert(spark.read.parquet(zPath)
      .agg(sum(col("x")), sum(col("y"))).collect().head ==
      df.agg(sum(col("x")), sum(col("y"))).collect().head)
  }

  test("manifest skipping prunes files and returns exactly the full filter") {
    val df = spark.range(30000).select(
      (col("id") * 48271 % 256).cast("int").as("x"),
      (col("id") * 69621 % 256).cast("int").as("y"),
      col("id").as("payload"))
    val path = graft.queries.ParityQueries.scratch("layout_skip")
    Layout.zorderWriteIndexed(spark, df, path, "x", "y",
      bits = 8, numFiles = 16)
    val total = Layout.fileBoxes(spark, path, "x", "y").count()
    val picked = Layout.selectFiles(spark, path, 10, 40, 200, 240)
    assert(picked.size < total,
      s"tile query must prune some of $total z-files, picked ${picked.size}")
    assert(picked.nonEmpty, "the box is populated — some file must match")
    val got = Layout.skippingScan(spark, path, "x", "y", 10, 40, 200, 240)
      .agg(count(lit(1)), sum(col("payload"))).collect().head
    val want = df.filter(col("x").between(10, 40) &&
        col("y").between(200, 240))
      .agg(count(lit(1)), sum(col("payload"))).collect().head
    assert(got == want, s"pruned scan diverged: $got vs $want")
    // empty box: schema preserved, zero rows, no file reads needed
    val empty = Layout.skippingScan(spark, path, "x", "y", 300, 400, 300, 400)
    assert(empty.count() == 0 &&
      empty.columns.toSeq == Seq("x", "y", "payload"))
  }
}
