package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal versioned parquet table — the transaction-log design the
  * reference gets from Delta (landing_to_bronze.py:8-9), restated on
  * plain parquet + a manifest log (no Delta jars in this environment,
  * and the mechanism is the point):
  *
  *   root/data/batch-<v>/part-*.parquet   immutable once written
  *   root/_log/v00001.manifest            one file path per line
  *
  * Every commit writes NEW data files into its own batch directory and
  * then publishes a manifest listing the files that make up that
  * version — an overwrite lists only its own files, an append lists the
  * previous version's plus its own, a rollback RE-LISTS an old
  * version's files as a new version (no data is ever copied or mutated;
  * history rewrites are impossible by construction). The manifest
  * rename is the atomic commit point: readers resolve the highest
  * complete manifest, so a writer crash before the rename leaves the
  * previous version intact and only orphan data files behind (reclaimed
  * by [[vacuum]]).
  *
  * At 100 TB this is why table formats exist: overwrite-in-place
  * either copies the table per version or loses time travel; the log
  * makes versioning O(changed files) in space and the version switch a
  * single metadata operation. Underscore/dot-prefixed paths are hidden
  * from Hadoop listings, so `_log` never surfaces as data. Single
  * writer assumed (the reference's Airflow DAG serializes writes the
  * same way); lock-free multi-writer needs a CAS on the manifest name,
  * which plain filesystems cannot give — documented, not faked.
  */
object VersionedTable {

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def logDir(root: String) = new HPath(s"$root/_log")

  private def manifestPath(root: String, v: Long) =
    new HPath(logDir(root), f"v$v%05d.manifest")

  /** Committed versions, ascending (empty for a fresh root). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark)
    if (!f.exists(logDir(root))) Seq.empty
    else f.listStatus(logDir(root)).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.matches("v\\d{5}\\.manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toLong }
      .sorted
  }

  private def readManifest(spark: SparkSession, root: String, v: Long)
      : Seq[String] = {
    val in = fs(spark).open(manifestPath(root, v))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      .filter(_.nonEmpty)
    finally in.close()
  }

  private def writeManifest(spark: SparkSession, root: String, v: Long,
      files: Seq[String]): Unit = {
    val f = fs(spark)
    f.mkdirs(logDir(root))
    val tmp = new HPath(logDir(root), f".v$v%05d.manifest.tmp")
    val out = f.create(tmp, true)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    require(f.rename(tmp, manifestPath(root, v)),
      s"manifest commit failed for $root v$v")
  }

  /** Write `df` as a new batch directory and return its file list
    * (root-relative paths).
    */
  private def writeBatch(spark: SparkSession, df: DataFrame, root: String,
      v: Long): Seq[String] = {
    val dir = f"data/batch-$v%05d"
    df.write.mode("error").parquet(s"$root/$dir")
    val f = fs(spark)
    f.listStatus(new HPath(s"$root/$dir")).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") &&
        !n.startsWith("."))
      .sorted
      .map(n => s"$dir/$n")
  }

  private def nextVersion(spark: SparkSession, root: String): Long =
    versions(spark, root).lastOption.getOrElse(0L) + 1

  /** Overwrite-commit: the new version consists of exactly this data. */
  def commit(spark: SparkSession, df: DataFrame, root: String): Long = {
    val v = nextVersion(spark, root)
    writeManifest(spark, root, v, writeBatch(spark, df, root, v))
    v
  }

  /** Append-commit: previous version's files plus this batch. */
  def append(spark: SparkSession, df: DataFrame, root: String): Long = {
    val v = nextVersion(spark, root)
    val prev =
      if (v == 1) Seq.empty
      else readManifest(spark, root, v - 1)
    writeManifest(spark, root, v, prev ++ writeBatch(spark, df, root, v))
    v
  }

  /** Publish version `to`'s file list as a NEW head version — time
    * travel for writers. O(1) data: nothing is copied.
    */
  def rollback(spark: SparkSession, root: String, to: Long): Long = {
    val have = versions(spark, root)
    require(have.contains(to), s"unknown version $to (have $have)")
    val v = have.last + 1
    writeManifest(spark, root, v, readManifest(spark, root, to))
    v
  }

  /** Read a version (default: latest). The file list comes from the
    * manifest, never from directory listing — orphans from crashed
    * writers are invisible.
    */
  def read(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.getOrElse {
      val have = versions(spark, root)
      require(have.nonEmpty, s"no committed versions under $root")
      have.last
    }
    val files = readManifest(spark, root, v).map(rel => s"$root/$rel")
    spark.read.parquet(files: _*)
  }

  /** Delete data files referenced by NO retained manifest (crashed
    * writers' orphans, or history dropped via `dropBefore`). Returns
    * the deleted file count. `dropBefore` first removes manifests below
    * the given version — time travel older than that is gone, as is
    * their exclusive data.
    */
  def vacuum(spark: SparkSession, root: String,
      dropBefore: Option[Long] = None): Int = {
    val f = fs(spark)
    dropBefore.foreach { cut =>
      versions(spark, root).filter(_ < cut)
        .foreach(v => f.delete(manifestPath(root, v), false))
    }
    val live: Set[String] = versions(spark, root)
      .flatMap(v => readManifest(spark, root, v)).toSet
    val dataRoot = new HPath(s"$root/data")
    if (!f.exists(dataRoot)) return 0
    var removed = 0
    f.listStatus(dataRoot).foreach { batch =>
      val bname = batch.getPath.getName
      f.listStatus(batch.getPath).foreach { file =>
        val rel = s"data/$bname/${file.getPath.getName}"
        if (!live.contains(rel)) { f.delete(file.getPath, false); removed += 1 }
      }
      if (f.listStatus(batch.getPath).isEmpty) f.delete(batch.getPath, true)
    }
    removed
  }
}
