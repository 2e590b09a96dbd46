package graft.dataprep

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-4 additions: cross-doc duplicate n-gram fraction, hybrid
  * filtered vector search, per-group embedding centroids, and the
  * multi-resolution rollup histogram.
  */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- dupNgramFraction ----

  test("dupNgramFraction: shared vs unique n-gram occurrences") {
    // docs 1 and 2 share every bigram; doc 3 shares none; doc 4 is
    // too short for bigrams and must drop out
    val df = Seq(
      (1L, "a b c"),
      (2L, "a b c"),
      (3L, "x y z"),
      (4L, "q")
    ).toDF("doc_id", "text")
    val out = CorpusStats.dupNgramFraction(df, "doc_id", "text", n = 2, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 1.0), // "a b","b c" both appear in 2 docs
      (2L, 2L, 2L, 1.0),
      (3L, 2L, 0L, 0.0)))
  }

  test("dupNgramFraction counts occurrences, not distinct grams") {
    // "a b" occurs twice in doc 1 (multiplicity) and once in doc 2;
    // doc 1's "b a" bridge bigram is unique to it
    val df = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = CorpusStats.dupNgramFraction(df, "doc_id", "text", n = 2, minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: grams = a b, b a, a b → 3 occurrences, 2 duplicated
    assert(out.toSeq == Seq((1L, 3L, 2L), (2L, 1L, 1L)))
  }

  // ---- chunkTokens ----

  test("chunkTokens: boundaries, overlap, short docs, empty docs") {
    val df = Seq(
      (1L, (1 to 7).map(i => s"t$i").mkString(" ")), // 7 toks: chunks 1-5, 4-7
      (2L, "a b"),                                   // fits in one chunk
      (3L, ""),                                      // no tokens → dropped
      (4L, (1 to 8).map(i => s"u$i").mkString(" "))  // 8 toks: 1-5, 4-8
    ).toDF("doc_id", "text")
    val out = TextPrep.chunkTokens(df, "doc_id", "text", maxTokens = 5, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 5L, "t1 t2 t3 t4 t5"),
      (1L, 1L, 4L, "t4 t5 t6 t7"),
      (2L, 0L, 2L, "a b"),
      (4L, 0L, 5L, "u1 u2 u3 u4 u5"),
      (4L, 1L, 5L, "u4 u5 u6 u7 u8")))
  }

  test("chunkTokens: every token appears, consecutive chunks share `overlap`") {
    val df = Seq((1L, (1 to 103).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = TextPrep.chunkTokens(df, "doc_id", "text", maxTokens = 20, overlap = 5)
      .collect().map(_.getString(3).split(" ").toSeq)
    // full coverage in order
    assert(chunks.map(_.drop(0)).reduce((a, b) => a ++ b.drop(5)) ==
      (1 to 103).map(i => s"w$i"))
    chunks.sliding(2).foreach {
      case Array(a, b) => assert(a.takeRight(5) == b.take(5)) // shared overlap
      case _           => ()
    }
  }

  // ---- filteredTopK ----

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f), 0),
    (2L, Array(0.8f, 0.2f), 1),
    (3L, Array(0.0f, 1.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("filteredTopK restricts the corpus side only") {
    val out = Similarity.filteredTopK(vecs, "vec_id", "embedding",
        queryIds = Seq(0L), k = 10, pred = col("label") === 1)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // query 0 has label 0 (still usable as query); neighbors only 2, 3
    assert(out.toSeq == Seq((2L, 1L), (3L, 2L)))
  }

  test("filteredTopK with a true predicate equals bruteForceTopK") {
    val a = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", Seq(0L, 3L), 2)
      .collect().toSeq
    val b = Similarity.filteredTopK(vecs, "vec_id", "embedding", Seq(0L, 3L), 2, lit(true))
      .collect().toSeq
    assert(a == b)
  }

  // ---- hard negatives ----

  test("hardNegatives: each query rejects its OWN label, ranked by similarity") {
    val out = Similarity.hardNegatives(vecs, "vec_id", "embedding", "label",
        queryIds = Seq(0L, 3L), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // query 0 (label 0): negatives are 2, 3 (label 1), 2 ranks first
    // (dot 0.8 > 0.0); query 3 (label 1): negatives are 0, 1 (label 0),
    // 1 first (dot 0.1 > 0.0)
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, 1L), (0L, 3L, 1L, 2L),
      (3L, 1L, 0L, 1L), (3L, 0L, 0L, 2L)))
  }

  test("hardNegatives equals filteredTopK when the corpus is one other label") {
    // with only two labels, query 0's per-query exclusion == static label===1
    val hn = Similarity.hardNegatives(vecs, "vec_id", "embedding", "label",
      queryIds = Seq(0L), k = 2).drop("neg_label").collect().toSeq
    val ft = Similarity.filteredTopK(vecs, "vec_id", "embedding",
      queryIds = Seq(0L), k = 2, pred = col("label") === 1).collect().toSeq
    assert(hn == ft)
  }

  test("tripletMine: nearest same-label positive, ranked hard negatives") {
    val out = Similarity.tripletMine(vecs, "vec_id", "embedding", "label",
        queryIds = Seq(0L, 3L), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // anchor 0 (label 0): positive = 1 (closest same-label);
    // negatives ranked 2 then 3. anchor 3 (label 1): positive = 2;
    // negatives ranked 1 then 0.
    assert(out.toSeq == Seq(
      (0L, 1L, 2L, 1L), (0L, 1L, 3L, 2L),
      (3L, 2L, 1L, 1L), (3L, 2L, 0L, 2L)))
  }

  test("tripletMine: anchors without a same-label partner drop out") {
    import org.apache.spark.sql.functions._
    val lonely = vecs.withColumn("label",
      when(col("vec_id") === 0L, lit(9)).otherwise(col("label")))
    val out = Similarity.tripletMine(lonely, "vec_id", "embedding", "label",
      queryIds = Seq(0L, 3L), k = 2)
    assert(out.select("query_id").collect().map(_.getLong(0)).toSet == Set(3L))
  }

  // ---- incremental minhash index ----

  test("dedupAgainstIndex reproduces the cross slice of full LSH, incl. after append") {
    val old1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val old2 = Seq(
      (3L, "red green blue cyan magenta yellow")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // dup of 1
      (11L, "red green blue cyan magenta KEY"),     // near-dup of 3
      (12L, "totally unrelated words here now")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx").toString
    Dedup.buildMinhashIndex(old1, "doc_id", "text", 128, 32, dir)
    Dedup.buildMinhashIndex(old2, "doc_id", "text", 128, 32, dir, mode = "append")

    val got = Dedup.dedupAgainstIndex(fresh, "doc_id", "text", 128, 32, 1, 2, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // expected = cross (new, old) pairs of the full-corpus LSH run
    val full = Dedup.minhashLshPairs(
        old1.union(old2).union(fresh), "doc_id", "text", 128, 32, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .collect { case (a, b) if b >= 10 && a < 10 => (b, a) }
      .sorted.toSeq
    assert(got == full && got.contains((10L, 1L)))
  }

  test("dedupAgainstIndex refuses an index from a different hash family") {
    // an index dir without the family marker (e.g. built before a
    // coefficient change) must fail loudly — its band keys would probe
    // to zero candidates and silently report "no duplicates"
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx_stale").toString
    val old1 = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    Dedup.buildMinhashIndex(old1, "doc_id", "text", 128, 32, dir)
    val marker = new java.io.File(dir).listFiles()
      .find(_.getName.startsWith("_MINHASH_FAMILY_V")).get
    assert(marker.delete())
    val fresh = Seq((10L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.dedupAgainstIndex(fresh, "doc_id", "text", 128, 32, 1, 2, dir).collect()
    }
    assert(e.getMessage.contains("incompatible hash family"))
  }

  test("migrateMinhashIndex rebuilds a stale-family index from its shingles; probes then succeed") {
    import org.apache.spark.sql.functions._
    val old1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val old2 = Seq(
      (3L, "red green blue cyan magenta yellow")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "red green blue cyan magenta KEY"),
      (12L, "totally unrelated words here now")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx_mig").toString
    // per-batch partitions, like streaming index maintenance writes them
    Dedup.buildMinhashIndex(old1, "doc_id", "text", 128, 32, dir,
      partition = Some("batch=0"))
    Dedup.buildMinhashIndex(old2, "doc_id", "text", 128, 32, dir,
      partition = Some("batch=1"))
    val expected = Dedup.dedupAgainstIndex(fresh, "doc_id", "text", 128, 32, 1, 2, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(expected.contains((10L, 1L)))
    // simulate a v1 index: band keys from a different (correlated)
    // family = any keys the current family wouldn't produce, no marker
    // (write aside + swap: Spark refuses overwriting a read-from path)
    val tmpBands = s"$dir/bands_v1tmp"
    spark.read.parquet(s"$dir/bands")
      .withColumn("bk", concat(lit("v1|"), col("bk").cast("string")))
      .write.partitionBy("batch").parquet(tmpBands)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(): Unit
    }
    rmrf(new java.io.File(s"$dir/bands"))
    assert(new java.io.File(tmpBands).renameTo(new java.io.File(s"$dir/bands")))
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_MINHASH_FAMILY_V")).foreach(f => assert(f.delete()))
    intercept[IllegalStateException] {
      Dedup.dedupAgainstIndex(fresh, "doc_id", "text", 128, 32, 1, 2, dir).collect()
    }
    // the migration: one pass over the family-independent shingles
    assert(Dedup.migrateMinhashIndex(spark, dir, 128, 32))
    val got = Dedup.dedupAgainstIndex(fresh, "doc_id", "text", 128, 32, 1, 2, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected, "migrated index probes like the original")
    // batch partition layout preserved for idempotent per-batch overwrite
    assert(new java.io.File(s"$dir/bands/batch=0").isDirectory &&
      new java.io.File(s"$dir/bands/batch=1").isDirectory)
    // idempotent: a current-family index is a no-op
    assert(!Dedup.migrateMinhashIndex(spark, dir, 128, 32))
  }

  // ---- groupCentroids ----

  test("groupCentroids: exact integer sums (all-integer output)") {
    val df = Seq(
      ("a", Array(1.0f, -2.0f)),
      ("a", Array(3.0f, 4.0f)),
      ("b", Array(0.5f, 0.25f))
    ).toDF("src", "embedding")
    val out = Similarity.groupCentroids(df, "src", "embedding")
    // compared surface is all-integer; the mean is sum_e6/n, derivable
    assert(out.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq ==
      Seq("grp" -> "string", "dim" -> "bigint", "n" -> "bigint", "sum_e6" -> "bigint"))
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      ("a", 0L, 2L, 4000000L),
      ("a", 1L, 2L, 2000000L),
      ("b", 0L, 1L, 500000L),
      ("b", 1L, 1L, 250000L)))
  }

  test("groupCentroids is partition-independent") {
    val base = (0L until 97L).map(i => (s"g${i % 3}", Array.tabulate(4)(d => (i * 7 + d).toFloat / 13f)))
    val df1 = base.toDF("src", "embedding").repartition(1)
    val df8 = base.toDF("src", "embedding").repartition(8)
    val a = Similarity.groupCentroids(df1, "src", "embedding").collect().toSeq
    val b = Similarity.groupCentroids(df8, "src", "embedding").collect().toSeq
    assert(a == b)
  }
}
