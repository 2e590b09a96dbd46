package graft.index

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec
import graft.model.{IndexType, SeqMapping}

class BloomIndexSpec extends SparkSpec {

  private val mapping = SeqMapping.of(
    "level" -> IndexType.Keyword,
    "msg"   -> IndexType.Text,
    "uri"   -> IndexType.Path,
  ).copy(caseSensitive = false)

  private def mkTable(): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bloom_tbl").toString
    val rows = (0 until 400).map { i =>
      val level = if (i == 137) "rare" else s"common${i % 3}"
      (i.toLong, level, s"message number $i from host h${i % 7}", s"/svc/app${i % 4}/op$i", i % 4)
    }
    rows.toDF("id", "level", "msg", "uri", "bucket")
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    TokenBloomIndex.build(spark, tmp, mapping, Seq("level", "msg", "uri"),
      numBits = 1 << 12, numHashes = 4)
    tmp
  }

  test("no false negatives: every inserted token passes its bloom") {
    val rnd = new scala.util.Random(3)
    val bits = new Array[Long]((1 << 12) / 64)
    val toks = (1 to 1000).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
    toks.foreach { t =>
      val ps = TokenBloomIndex.bitPositions(UTF8String.fromString(t), 1 << 12, 4)
      ps.foreach(p => bits(p >>> 6) |= 1L << (p & 63))
    }
    assert(toks.forall(t => TokenBloomIndex.maybeContains(bits, 1 << 12, 4, t)))
  }

  test("requiredTokens: conjunctive-only extraction, folding, tokenization") {
    val rt = TokenBloomIndex.requiredTokens(
      "level:ERROR and msg:'Disk Full' and uri:/svc/app1", mapping)
    assert(rt("level") == Seq("error"))            // keyword folded
    assert(rt("msg").toSet == Set("disk", "full")) // text tokenized + folded
    assert(rt("uri") == Seq("/svc/app1"))
    // or/not/wildcard/range/exists branches never contribute
    assert(TokenBloomIndex.requiredTokens("level:a or level:b", mapping).isEmpty)
    assert(TokenBloomIndex.requiredTokens("not level:a", mapping).isEmpty)
    assert(TokenBloomIndex.requiredTokens("level:ab*", mapping).isEmpty)
    assert(TokenBloomIndex.requiredTokens("level:[a, b]", mapping).isEmpty)
    assert(TokenBloomIndex.requiredTokens("_exists_:level", mapping).isEmpty)
    // and-reachable terms survive next to non-contributing branches
    val mixed = TokenBloomIndex.requiredTokens(
      "level:rare and (msg:x or msg:y)", mapping)
    assert(mixed == Map("level" -> Seq("rare")))
  }

  test("pruning narrows the file list and never drops a match") {
    val tmp = mkTable()
    val all = spark.read.parquet(tmp).inputFiles.toSet
    assert(all.size >= 4)

    // 'rare' lives in exactly one bucket file
    val cand = TokenBloomIndex.candidateFiles(spark, tmp,
      Map("level" -> Seq("rare"))).get
    assert(cand.size < all.size)
    val full = spark.read.parquet(tmp).where(col("level") === "rare")
      .select("id").collect().map(_.getLong(0)).toSet
    val pruned = TokenBloomIndex.prunedRead(spark, tmp, "level:rare", mapping)
      .where(col("level") === "rare")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pruned == full && full == Set(137L))
    // partition column survives the basePath read
    assert(TokenBloomIndex.prunedRead(spark, tmp, "level:rare", mapping)
      .columns.contains("bucket"))

    // text tokens prune too: host h3 appears only in bucket 3's ids... every
    // bucket actually — use a conjunctive pair that co-occurs in one file only
    val prunedTok = TokenBloomIndex.prunedRead(spark, tmp, "msg:'number 137'", mapping)
      .where(array_contains(graft.functions.Tokenizers.textTokens(col("msg"), false), "137"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(prunedTok == Set(137L))

    // a query with nothing conjunctively required reads everything
    assert(TokenBloomIndex.prunedRead(spark, tmp, "level:a or level:b", mapping)
      .inputFiles.toSet == all)
  }

  test("files appended after the build are never pruned away") {
    import spark.implicits._
    val tmp = mkTable()
    Seq((9999L, "rare", "late arrival", "/svc/late/x", 9))
      .toDF("id", "level", "msg", "uri", "bucket")
      .write.mode("append").partitionBy("bucket").parquet(tmp)
    val pruned = TokenBloomIndex.prunedRead(spark, tmp, "level:rare", mapping)
      .where(col("level") === "rare")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pruned == Set(137L, 9999L))
  }

  test("incremental update indexes only unseen files and restores pruning") {
    import spark.implicits._
    val tmp = mkTable()
    Seq((5000L, "vanishing", "brand new doc", "/svc/new/op", 7))
      .toDF("id", "level", "msg", "uri", "bucket")
      .write.mode("append").partitionBy("bucket").parquet(tmp)
    // before update: the new file is unknown → kept for ANY probe
    val before = TokenBloomIndex.candidateFiles(spark, tmp,
      Map("level" -> Seq("rare"))).get
    val n = TokenBloomIndex.update(spark, tmp, mapping, Seq("level", "msg", "uri"),
      numBits = 1 << 12, numHashes = 4)
    assert(n == 1)
    // after update: a 'rare' probe drops the new file, a 'vanishing'
    // probe finds it, and re-running update is a no-op
    val after = TokenBloomIndex.candidateFiles(spark, tmp,
      Map("level" -> Seq("rare"))).get
    assert(after.size < before.size)
    val hit = TokenBloomIndex.prunedRead(spark, tmp, "level:vanishing", mapping)
      .where(col("level") === "vanishing").select("id").collect().map(_.getLong(0)).toSet
    assert(hit == Set(5000L))
    assert(TokenBloomIndex.update(spark, tmp, mapping, Seq("level")) == 0)
  }

  test("disjunctive (any-of) pruning: union of survivors, lookups never miss") {
    val tmp = mkTable()
    val all = spark.read.parquet(tmp).inputFiles.toSet
    // ids 7 and 137 live in buckets 3 and 1 — kept files must cover
    // both, pruning the remaining buckets (keyword 'level' field holds
    // common{0,1,2}/rare; use msg tokens which carry the unique doc id)
    val cand = TokenBloomIndex.candidateFilesAny(spark, tmp, "msg", Seq("7", "137")).get
    assert(cand.size < all.size)
    val got = TokenBloomIndex.prunedReadAny(spark, tmp, "msg", Seq("7", "137"))
      .where(col("id").isin(7L, 137L)).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(7L, 137L))
    // unknown field → no pruning, full read
    assert(TokenBloomIndex.prunedReadAny(spark, tmp, "nope", Seq("x"))
      .inputFiles.toSet == all)
  }

  test("a file covered by only SOME sidecars is never pruned") {
    import spark.implicits._
    val tmp = mkTable()
    Seq((7777L, "rare", "partial coverage doc", "/svc/p/x", 8))
      .toDF("id", "level", "msg", "uri", "bucket")
      .write.mode("append").partitionBy("bucket").parquet(tmp)
    // update only the 'level' sidecar: 'msg' has never seen the file
    TokenBloomIndex.update(spark, tmp, mapping, Seq("level"),
      numBits = 1 << 12, numHashes = 4)
    // a query requiring tokens of BOTH fields must keep the file
    // ('msg' couldn't examine it) even though 'level' examined it
    val got = TokenBloomIndex.prunedRead(spark, tmp,
      "level:rare and msg:'partial coverage'", mapping)
      .where(col("level") === "rare").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got.contains(7777L))
  }

  test("path prefixes: exact prefix probe hits files with docs under it") {
    val tmp = mkTable()
    val cand = TokenBloomIndex.candidateFiles(spark, tmp,
      Map("uri" -> Seq("/svc/app1"))).get
    // app1 uris exist only in bucket 1 (op index ≡ bucket mod 4)
    val full = spark.read.parquet(tmp)
      .where(col("uri").startsWith("/svc/app1/")).count()
    val prunedCnt = TokenBloomIndex.prunedRead(spark, tmp, "uri:/svc/app1", mapping)
      .where(col("uri").startsWith("/svc/app1/")).count()
    assert(prunedCnt == full && full == 100L)
    assert(cand.size < spark.read.parquet(tmp).inputFiles.size)
  }
}
