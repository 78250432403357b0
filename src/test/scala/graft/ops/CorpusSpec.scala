package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("shuffleShards: reproducible permutation, dense per-shard positions") {
    val df = (1L to 200L).toDF("doc_id")
    val out = Corpus.shuffleShards(df, "doc_id", nShards = 10)
      .select("doc_id", "shuffle_key", "shard", "pos")
      .as[(Long, Long, Int, Int)].collect()

    // complete permutation: every input id appears exactly once
    assert(out.map(_._1).sorted.toSeq == (1L to 200L))
    // shard derived from the key, in range
    out.foreach { case (_, key, shard, _) =>
      assert(shard == (key % 10).toInt && shard >= 0 && shard < 10)
    }
    // positions are dense 1..n within every shard, ordered by (key, id)
    out.groupBy(_._3).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_._4)
      assert(byPos.map(_._4).toSeq == (1 to rows.length))
      assert(byPos.map(r => (r._2, r._1)).toSeq ==
        byPos.map(r => (r._2, r._1)).sortBy(identity).toSeq)
    }
    // deterministic: a second run yields the identical layout
    val again = Corpus.shuffleShards(df, "doc_id", nShards = 10)
      .select("doc_id", "shuffle_key", "shard", "pos")
      .as[(Long, Long, Int, Int)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("shuffleShards physical layout: range+sort write round-trips") {
    // the documented write path: repartitionByRange on shard, sorted
    // within partitions, one directory per shard — read back intact
    val df = (1L to 120L).toDF("doc_id")
    val laid = Corpus.shuffleShards(df, "doc_id", nShards = 4)
    val tmp = graft.Scratch.dir(sys.props("java.io.tmpdir"),
      "graft_scratch") + "/corpus_shards"
    laid.repartitionByRange(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(tmp)
    val back = spark.read.parquet(tmp)
      .select("doc_id", "shuffle_key", "shard", "pos")
      .as[(Long, Long, Int, Int)].collect().sortBy(r => (r._3, r._4))
    val want = laid.as[(Long, Long, Int, Int)].collect()
      .sortBy(r => (r._3, r._4))
    assert(back.toSeq == want.toSeq)
    // partition discovery sees one directory per shard
    val dirs = new java.io.File(tmp).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.length == 4)
  }

  test("normalize collapses whitespace/control runs and trims") {
    val df = Seq(
      (1L, "  Hello\t\tWorld  "),
      (2L, "a\r\nbc"),
      (3L, "already clean"),
      (4L, "\n\n\n")).toDF("doc_id", "text")
    val out = Corpus.normalize(df, "doc_id", "text")
      .as[(Long, String, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == "hello world" && out(1L)._3 == 11)
    // the \x01 control byte collapses to a separator too (NUL..US range)
    assert(out(2L)._2 == "a b c")
    assert(out(3L)._2 == "already clean")
    assert(out(4L)._2 == "" && out(4L)._3 == 0)
  }

  test("vocab: totals + doc frequency without Expand, deterministic cutoff") {
    val df = Seq(
      (1L, "a a b c"),
      (2L, "a b b"),
      (3L, "c")).toDF("doc_id", "text")
    val all = Corpus.vocab(df, "doc_id", "text", topN = 10)
      .as[(String, Long, Int)].collect()
    assert(all.toSeq == Seq(("a", 3L, 2), ("b", 3L, 2), ("c", 2L, 2)))
    // topN cuts on the (total desc, token) order — 'c' drops first
    val top2 = Corpus.vocab(df, "doc_id", "text", topN = 2)
      .as[(String, Long, Int)].collect()
    assert(top2.map(_._1).toSeq == Seq("a", "b"))
  }

  test("trainValTestSplit: proportions near target, assignment corpus-independent") {
    val df = (1L to 2000L).toDF("doc_id")
    val s = Corpus.trainValTestSplit(df, "doc_id", valPct = 5, testPct = 5)
      .as[(Long, String)].collect().toMap
    val n = s.size.toDouble
    assert(math.abs(s.values.count(_ == "val") / n - 0.05) < 0.02)
    assert(math.abs(s.values.count(_ == "test") / n - 0.05) < 0.02)
    assert(s.values.count(_ == "train") / n > 0.85)
    // a document's split never changes when the corpus shrinks/grows
    val sub = Corpus.trainValTestSplit(
      df.filter($"doc_id" <= 500), "doc_id", 5, 5)
      .as[(Long, String)].collect().toMap
    sub.foreach { case (id, sp) => assert(s(id) == sp) }
  }

  test("splitLeakage: only cross-side exact dups surface, with twin counts") {
    // pick ids by their actual md5 buckets: one eval-side, three train-side
    val buckets = spark.range(1, 200).toDF("doc_id")
      .withColumn("b", graft.ops.Dedup.hashBucket($"doc_id"))
      .as[(Long, Long)].collect().toMap
    val evalId = buckets.find(_._2 < 5).get._1
    val trainIds = buckets.filter(_._2 >= 10).keys.take(3).toSeq
    val df = (Seq(evalId -> "shared content") ++
      trainIds.take(2).map(_ -> "shared content") ++
      Seq(trainIds(2) -> "unique content")).toDF("doc_id", "text")
    val out = Corpus.splitLeakage(df, "doc_id", "text", 5, 5)
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == 1)
    val r = out.head
    assert(r._1 == evalId && r._2 == "val" && r._3 == 2) // two train twins
    assert(r._4 == trainIds.take(2).min)
    // dups fully inside train never surface
    assert(!out.exists(_._1 != evalId))
  }

  test("releaseDiff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val next = Seq((2L, "b"), (3L, "cX"), (4L, "d")).toDF("doc_id", "text")
    val out = Corpus.releaseDiff(old, next, "doc_id")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("vocabDrift: movers ranked by frequency delta, one-sided tokens survive the outer join") {
    val old = Seq((1L, "a a a b"), (2L, "a b gone")).toDF("doc_id", "text")
    val next = Seq((1L, "a b b b"), (2L, "a b fresh")).toDF("doc_id", "text")
    val out = Corpus.vocabDrift(old, next, "text", topN = 10)
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // totals: old 7 tokens, new 7 tokens
    assert(out("a") == (("a", 4L, 2L, 0.571429, 0.285714, -0.285715)))
    assert(out("gone")._3 == 0L && out("gone")._6 < 0)   // vanished token
    assert(out("fresh")._2 == 0L && out("fresh")._6 > 0) // new token
    // ranked by |drift| desc with token tie-break: 'a' and 'b' tie on
    // |0.285715|, 'a' wins the tie lexicographically
    val first = Corpus.vocabDrift(old, next, "text", topN = 2)
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(first.map(_._1).toSeq == Seq("a", "b"))
    assert(first(1)._6 == 0.285715)
  }

  test("dataCard: per-slice counts, dup rate, token share sum to 1") {
    val df = Seq(
      (1L, "srcA", "en", "one two three"),
      (2L, "srcA", "en", "one two three"), // exact dup of 1
      (3L, "srcA", "en", "four five"),
      (4L, "srcB", "en", "six"),
      (5L, "srcB", "de", "sieben  acht") // double space: ws-mode = 2 tokens
    ).toDF("doc_id", "source", "lang", "text")
    val card = Corpus.dataCard(df, "source", "lang")
    val rows = card.select("source", "lang", "n_docs", "n_distinct_texts",
        "total_tokens", "dup_rate", "token_share")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val aEn = rows(("srcA", "en"))
    assert(aEn._3 == 3 && aEn._4 == 2) // 3 docs, 2 distinct texts
    assert(math.abs(aEn._6 - 0.333333) < 1e-9) // dup_rate = 1 - 2/3
    assert(aEn._5 == 8) // 3 + 3 + 2 ws tokens
    assert(rows(("srcB", "de"))._5 == 2) // multi-space run = one separator
    assert(rows(("srcB", "en"))._6 == 0.0)
    // token shares over all slices sum to 1 (up to rounding)
    val shareSum = rows.values.map(_._7).sum
    assert(math.abs(shareSum - 1.0) < 1e-5, s"shares sum to $shareSum")
  }

  test("dataCardSketch: HLL distincts within 4*rsd of exact, card otherwise identical") {
    // 600 docs; each parity slice cycles i%200 over its parity, so
    // every slice holds exactly 100 distinct texts by construction
    val df = (0 until 600).map { i =>
      (i.toLong, s"src${i % 2}", "en", s"text body ${i % 200} (${i % 2})")
    }.toDF("doc_id", "source", "lang", "text")
    val exact = Corpus.dataCard(df, "source", "lang")
      .select("source", "lang", "n_docs", "total_chars", "total_tokens",
        "min_chars", "max_chars", "avg_tokens", "token_share")
      .collect().map(_.toSeq).toSet
    val sk = Corpus.dataCardSketch(df, "source", "lang")
    assert(sk.select("source", "lang", "n_docs", "total_chars",
        "total_tokens", "min_chars", "max_chars", "avg_tokens",
        "token_share")
      .collect().map(_.toSeq).toSet == exact,
      "non-distinct columns must be identical to the exact card")
    val approx = sk.select("source", "n_distinct_texts")
      .as[(String, Long)].collect().toMap
    approx.values.foreach(a =>
      assert(math.abs(a - 100L) <= 4 * 0.05 * 100, s"approx $a vs 100"))
    // the audit face agrees
    val audit = Corpus.dataCardSketchAudit(df, "source", "lang")
      .select("distinct_within_tol").as[Boolean].collect()
    assert(audit.length == 2 && audit.forall(identity))
  }

  test("publishRelease: write + read-back manifest verifies; tampering flips its shard red") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pub_").toString
    val release = (1L to 40L).map(i => (i, s"document number $i body"))
      .toDF("doc_id", "text")
    val out = Corpus.publishRelease(release, "doc_id", "text",
        nShards = 4, outDir = s"$dir/release")
      .as[(Int, Long, Long, String, String, Boolean)].collect()
    assert(out.length == 4 && out.forall(_._6),
      s"clean publish must verify: ${out.mkString(",")}")
    assert(out.map(_._2).sum == 40) // every doc landed in some shard
    // tamper with ONE physical shard: drop a row from its partition dir
    val victim = out.head._1
    val part = s"$dir/release/shard=$victim"
    val survivors = spark.read.parquet(part)
    val dropped = survivors.orderBy(col("doc_id")).limit(1)
      .select("doc_id").as[Long].head()
    val tampered = survivors.filter(col("doc_id") =!= dropped)
      .localCheckpoint(true)
    tampered.write.mode("overwrite").parquet(part)
    val audit = Corpus.verifyPublished(release, "doc_id", "text",
        nShards = 4, outDir = s"$dir/release")
      .as[(Int, Long, Long, String, String, Boolean)].collect()
      .map(r => r._1 -> r._6).toMap
    assert(!audit(victim), "the tampered shard must fail verification")
    assert(audit.filter(_._1 != victim).values.forall(identity),
      "untouched shards must still verify")
  }

  test("versioned publish: bad release rolls back by metadata; time travel " +
      "reads every version; tamper flips the shard red") {
    import graft.pipeline.VersionedTable
    val root = java.nio.file.Files.createTempDirectory("graft_vpub_")
      .toString + "/release"
    val good = (1L to 40L).map(i => (i, s"document number $i body"))
      .toDF("doc_id", "text")
    val bad = good.filter(col("doc_id") % 3 =!= 0)
    def allMatch(out: Array[(Int, Long, Long, String, String, Boolean)]) =
      out.forall(_._6)
    // v1: good publish verifies
    val v1 = Corpus.publishReleaseVersioned(good, "doc_id", "text", 4, root)
      .as[(Int, Long, Long, String, String, Boolean)].collect()
    assert(v1.length == 4 && allMatch(v1) && v1.map(_._2).sum == 40)
    // v2: the bad publish verifies AGAINST ITSELF (the write is fine;
    // the CONTENT is the regression) — and the head no longer matches
    // the good release
    val v2 = Corpus.publishReleaseVersioned(bad, "doc_id", "text", 4, root)
      .as[(Int, Long, Long, String, String, Boolean)].collect()
    assert(allMatch(v2))
    val headVsGood = Corpus.verifyPublishedVersioned(good, "doc_id",
        "text", 4, root)
      .as[(Int, Long, Long, String, String, Boolean)].collect()
    assert(!allMatch(headVsGood), "bad head must not verify as the good release")
    // metadata rollback: the head is the good release again, nothing
    // was rewritten (batch dirs are immutable)
    VersionedTable.rollback(spark, root, to = 1L)
    val afterRb = Corpus.verifyPublishedVersioned(good, "doc_id", "text",
        4, root)
      .as[(Int, Long, Long, String, String, Boolean)].collect()
    assert(allMatch(afterRb), "rollback must restore the good release")
    // time travel: v2 still reads as the bad release, by version number
    assert(VersionedTable.read(spark, root, Some(2L)).count() ==
      bad.count())
    assert(VersionedTable.versions(spark, root) == Seq(1L, 2L, 3L))
    // tamper with a physical data file of v1's batch: the rolled-back
    // head must flip exactly that shard red
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val batch1 = new org.apache.hadoop.fs.Path(s"$root/data/batch-00001")
    val victimFile = fs.listStatus(batch1).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
    val vrows = spark.read.parquet(victimFile.toString).localCheckpoint(true)
    assert(vrows.count() > 0)
    val truncated = vrows.limit((vrows.count() - 1).toInt)
      .localCheckpoint(true)
    fs.delete(victimFile, false)
    val tmp = victimFile.toString + ".rewrite"
    truncated.coalesce(1).write.parquet(tmp)
    val rewritten = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.rename(rewritten, victimFile)
    val audit = Corpus.verifyPublishedVersioned(good, "doc_id", "text",
        4, root)
      .as[(Int, Long, Long, String, String, Boolean)].collect()
    assert(audit.exists(!_._6), "tampered batch file must fail verification")
  }

  test("curriculum: bucketed positions equal the global (tier, key, id) " +
      "rank — a dense 1..n permutation, tiers in ascending blocks") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val spark2 = spark; import spark2.implicits._
    val tiers = (1L to 400L).toDF("doc_id")
      .withColumn("tier",
        when(col("doc_id") % 4 === 0, 1).when(col("doc_id") % 4 === 1, 2)
          .when(col("doc_id") % 4 === 2, 3).otherwise(4))
    val out = Corpus.curriculum(tiers, "doc_id")
      .as[(Long, Int, Long, Long)].collect()
    // dense permutation
    assert(out.map(_._4).sorted.toSeq == (1L to 400L).toSeq)
    // position order IS the (tier, shuffle_key, doc_id) order
    val byPos = out.sortBy(_._4).map(r => (r._2, r._3, r._1)).toSeq
    assert(byPos == byPos.sorted)
    // tier blocks are contiguous: max position of tier t < min of t+1
    val ranges = out.groupBy(_._2).view
      .mapValues(rs => (rs.map(_._4).min, rs.map(_._4).max)).toMap
    (1 to 3).foreach(t => assert(ranges(t)._2 < ranges(t + 1)._1))
  }
}
