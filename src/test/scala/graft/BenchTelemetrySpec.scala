package graft

import org.apache.spark.sql.functions._

/** Pins the bench artifact's per-query JVM telemetry (VERDICT r19
  * task 2): every measured entry — sweep, canary, re-time, they all go
  * through `Bench.measureQuery` — must carry a GC-time delta and a
  * post-query heap-used reading, and the emitted `"jvm"` block must
  * have the exact `{"name":[gc_ms,heap_mb]}` shape, so the next
  * verdict can adjudicate host-window noise vs JVM/session pressure
  * from the artifact alone.
  */
class BenchTelemetrySpec extends SparkSpec {

  test("measureQuery returns timing samples plus gc/heap/storage telemetry") {
    val m = Bench.measureQuery(spark, sf0001, runs = 3,
      (s, dir) => s.read.parquet(s"$dir/region.parquet")
        .agg(count(lit(1)).as("n")))
    assert(m.samples.size == 3 && m.samples.forall(_ > 0.0))
    assert(m.median == m.samples.sorted.apply(1))
    assert(m.gcMs >= 0L, "GC delta must be a non-negative wall-ms count")
    assert(m.heapMb > 0L && m.heapMb <= (Runtime.getRuntime.maxMemory >> 20),
      "heap-used must be a sane MiB reading")
    assert(m.storageMb >= 0L,
      "block-manager storage must be a non-negative MiB reading")
  }

  test("jvm block emits {\"name\":[gc_ms,heap_mb,storage_mb]} and session " +
      "counters are live") {
    val js = Bench.jvmJson(scala.collection.mutable.LinkedHashMap(
      "q_a" -> ((12L, 345L, 67L)), "q_b" -> ((0L, 7L, 0L))))
    assert(js == """{"q_a":[12,345,67],"q_b":[0,7,0]}""")
    assert(Bench.jvmJson(Map.empty[String, (Long, Long, Long)]) == "{}")
    // the session counters the artifact's jvm_session block reads
    assert(Bench.gcTotalMs() >= 0L)
    assert(Bench.heapUsedMb() > 0L)
    assert(Bench.storageUsedMb(spark) >= 0L)
  }

  test("dirUsedMb sums a scratch tree and is 0 for missing paths") {
    val d = java.nio.file.Files.createTempDirectory("graft_scr_")
    val sub = java.nio.file.Files.createDirectory(d.resolve("sub"))
    java.nio.file.Files.write(sub.resolve("spill.bin"),
      Array.fill[Byte](3 << 20)(1))
    assert(Bench.dirUsedMb(d.toString) == 3L)
    assert(Bench.dirUsedMb("/nonexistent/graft_scratch") == 0L)
  }
}
