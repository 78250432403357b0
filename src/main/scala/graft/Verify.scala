package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Dump ONE declared query. On success writes the normalized result
    * parquet; on failure writes a one-row `__error` parquet in its place,
    * so a broken query SURFACES in the driver's compare as a failing row
    * (schema mismatch vs its oracle) instead of vanishing from the gate —
    * the round-12 lesson, where a dead query left CORRECTNESS looking
    * all-green. Returns the error message when the query failed.
    */
  def dumpOne(spark: SparkSession, sfDir: String, outDir: String,
              name: String,
              fn: (SparkSession, String) => DataFrame): Option[String] = {
    try {
      val out = fn(spark, sfDir)
      // Session TZ is UTC, so TIMESTAMP -> TIMESTAMP_NTZ keeps the
      // wall-clock value; the dump then carries the same naive-micros
      // logical type DuckDB's oracle produces.
      val normed = out.schema.fields.foldLeft(out) { (d, f) =>
        if (f.dataType == TimestampType)
          d.withColumn(f.name, col(f.name).cast(TimestampNTZType))
        else d
      }
      normed.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      None
    } catch { case e: Throwable =>
      val msg = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(1000)}"
      System.err.println(s"[verify] $name failed: $msg")
      // The error artifact itself must never take down the run (e.g. a
      // session so broken even a 1-row write fails): best-effort write,
      // the returned message is recorded in verify_errors.json either way.
      try {
        import spark.implicits._
        Seq(msg).toDF("__error").coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case w: Throwable =>
        System.err.println(s"[verify] $name: error artifact write also failed: ${w.getMessage}")
      }
      Some(msg)
    }
    // release per-query persisted sketches even when the query failed —
    // a leak here would eat the memory budget of every later query
    finally spark.catalog.clearCache()
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // Pin the JVM default timezone too (not just the session TZ):
    // java.sql.Timestamp literals and NTZ casts otherwise shift on a
    // non-UTC host and silently break the oracle compare.
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // tmpfs shuffle scratch (see Bench.scratchDir: /tmp disk stalls)
      .config("spark.local.dir", Bench.scratchDir())
      // Plain micros timestamps in the dumped parquet (not INT96), so the
      // driver's DuckDB/pyarrow compare sees the same logical type the
      // oracle produces.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev loop: SPARK_GRAFT_VERIFY_ONLY=q1,q2 restricts the dump AND the
    // oracle json to the named queries (check_oracle.py fails on dumps
    // missing vs oracle_sql.json, so both must filter together).
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def wanted(name: String): Boolean = only.forall(_.contains(name))
    val errors = SparkEntry.queries.filter(kv => wanted(kv._1)).toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        dumpOne(spark, sfDir, outDir, name, fn).map(name -> _)
      }
    // Always write the error summary (empty object = clean run), so both
    // driver and humans can distinguish "all ran" from "some rows are
    // __error artifacts" without parsing every dump.
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    val json = SparkEntry.oracleSql.filter(kv => wanted(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.map(_._1).mkString(", "))
    spark.stop()
  }
}
