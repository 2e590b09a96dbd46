package graft

import graft.SparkSpec

/** The graft_* SQL functions must agree with the Scala Column API
  * (same expressions underneath) and be callable from pure SQL.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("graft_tokens matches the Scala tokenizer, incl. case flag") {
    val out = spark.sql(
      "SELECT graft_tokens('Foo-Bar_7 baz'), graft_tokens('Foo BAR', true)")
      .collect()(0)
    assert(out.getSeq[String](0) == Seq("foo", "bar_7", "baz"))
    assert(out.getSeq[String](1) == Seq("Foo", "BAR"))
  }

  test("SQL shingle → minhash → band pipeline equals the Column API") {
    val df = Seq("the quick brown fox", "pack my box with jugs").toDF("text")
    df.createOrReplaceTempView("__ext_docs")
    val sql = spark.sql(
      """SELECT graft_minhash_band_keys(
           graft_bigram_hashes(graft_tokens(text)), 16, 4) AS bk
         FROM __ext_docs""").collect().map(_.getSeq[Long](0))
    val api = df.select(
        functions.VectorExpressions.minhashBandKeys(
          functions.TokenizeExpr.bigramHashes(
            functions.TokenizeExpr.tokens(org.apache.spark.sql.functions.col("text"),
              caseSensitive = false)), 16, 4).as("bk"))
      .collect().map(_.getSeq[Long](0))
    assert(sql.toSeq == api.toSeq)
  }

  test("vector and hash kernels evaluate from SQL") {
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)),
                graft_sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)),
                graft_mix64(42L),
                graft_nfc_fold('  Á  b  '),
                graft_simhash_portable64(array('a', 'b')),
                graft_portable_hash('a')""").collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == graft.functions.SeqAggregates.mix64(42L))
    assert(r.getString(3) == "  á  b  ") // NFC + case fold only; no ws collapse
    assert(r.getLong(5) == graft.functions.PortableSimHash.hashToken("a"))
  }

  test("graft_doc_time extracts ms from any of the time fields") {
    val r = spark.sql(
      """SELECT graft_doc_time('{"ts":"2024-01-01T00:00:00Z","x":1}').ms,
                graft_doc_time('{"nope":1}').ms""").collect()(0)
    assert(r.getLong(0) == 1704067200000L)
    assert(r.isNullAt(1))
  }

  test("non-literal parameter arguments are rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_lsh_buckets(array(1.0d), CAST(rand()*4 AS INT))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
