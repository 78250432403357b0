package graft.pipeline

import graft.SparkSpec
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_vt_$tag").toString + "/t"

  test("commit/append/time-travel: every version stays readable") {
    val root = freshRoot("tt")
    val v1 = VersionedTable.commit(spark, Seq(1, 2).toDF("x"), root)
    val v2 = VersionedTable.append(spark, Seq(3).toDF("x"), root)
    val v3 = VersionedTable.commit(spark, Seq(9).toDF("x"), root)
    assert((v1, v2, v3) == (1L, 2L, 3L))
    def vals(v: Long) = VersionedTable.read(spark, root, Some(v))
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(vals(1) == Seq(1, 2))
    assert(vals(2) == Seq(1, 2, 3)) // append keeps v1's files
    assert(vals(3) == Seq(9))       // overwrite lists only its own
    assert(VersionedTable.read(spark, root).collect()
      .map(_.getInt(0)).toSeq == Seq(9))
  }

  test("rollback republishes an old file list; history is append-only") {
    val root = freshRoot("rb")
    VersionedTable.commit(spark, Seq(1, 2).toDF("x"), root)
    VersionedTable.commit(spark, Seq(7).toDF("x"), root)
    val v3 = VersionedTable.rollback(spark, root, to = 1)
    assert(v3 == 3)
    assert(VersionedTable.read(spark, root).collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    // the rolled-over version 2 is still time-travelable
    assert(VersionedTable.read(spark, root, Some(2)).collect()
      .map(_.getInt(0)).toSeq == Seq(7))
    assert(VersionedTable.versions(spark, root) == Seq(1L, 2L, 3L))
  }

  test("a crashed writer's half batch is invisible and vacuumable") {
    val root = freshRoot("crash")
    VersionedTable.commit(spark, Seq(1).toDF("x"), root)
    // simulate a crash AFTER data write, BEFORE manifest publish:
    // stray data files with no manifest entry
    Seq(99).toDF("x").write.parquet(s"$root/data/batch-00099")
    assert(VersionedTable.read(spark, root).collect()
      .map(_.getInt(0)).toSeq == Seq(1))
    val removed = VersionedTable.vacuum(spark, root)
    assert(removed >= 1)
    // live data untouched
    assert(VersionedTable.read(spark, root).collect()
      .map(_.getInt(0)).toSeq == Seq(1))
  }

  test("vacuum(dropBefore) reclaims exclusive old data, keeps shared") {
    val root = freshRoot("vac")
    VersionedTable.commit(spark, Seq(1).toDF("x"), root)   // v1: batch-1
    VersionedTable.append(spark, Seq(2).toDF("x"), root)   // v2: b1+b2
    VersionedTable.commit(spark, Seq(3).toDF("x"), root)   // v3: b3
    // dropping history below v2 keeps batch-1 (still referenced by v2)
    VersionedTable.vacuum(spark, root, dropBefore = Some(2L))
    assert(VersionedTable.versions(spark, root) == Seq(2L, 3L))
    assert(VersionedTable.read(spark, root, Some(2)).collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    // now drop below v3: batch-1 and batch-2 become unreferenced
    val removed = VersionedTable.vacuum(spark, root, dropBefore = Some(3L))
    assert(removed >= 2)
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new HPath(s"$root/data/batch-00001")))
    assert(VersionedTable.read(spark, root).collect()
      .map(_.getInt(0)).toSeq == Seq(3))
  }
}
