package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.DocsTable
import graft.model.{IndexType, SeqMapping}
import graft.functions.Tokenizers

/** Adapters exposing the driver-generated testdata
  * (/root/testdata/sf0.001 etc, see TESTDATA.md) as seq-db style docs tables.
  * `events` plays the role of the log stream (ts → MID, event_id → RID);
  * `documents`/`embeddings` back the training-data operators.
  */
object TestTables {

  /** The events table's `ts` physical type has varied across testdata
    * generations: pandas nanosecond timestamps (readable only as Long
    * nanos behind the legacy flag) vs plain microsecond timestamps
    * (read as TIMESTAMP_NTZ). All derivations below are type-aware so
    * either generation loads; the session timezone is pinned to UTC so
    * an NTZ wall-clock reading converts to the same instant the data
    * generator wrote.
    */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  def raw(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** events → docs: mid/rid per the reference ID model (seq/seq.go:12-19).
    * `props_k` materializes the JSON field `props.k` as a keyword column
    * (reference object-mapping dotted address, SURVEY.md §1.2);
    * `value_cents` is an exact integer mirror of `value` for
    * float-stable aggregation.
    */
  val eventsMapping: SeqMapping = SeqMapping.of(
    "event_id"   -> IndexType.Keyword,
    "user_id"    -> IndexType.Keyword,
    "event_type" -> IndexType.Keyword,
    "value"      -> IndexType.Keyword,
    "value_cents"-> IndexType.Keyword,
    "props"      -> IndexType.Keyword,
    "props_k"    -> IndexType.Keyword,
    "props.k"    -> IndexType.Keyword,
    "mid"        -> IndexType.Keyword,
  ).copy(caseSensitive = true)

  /** Epoch-millis `mid` from whatever physical type `ts` carries.
    * Long nanos → exact integer division (double division would lose
    * precision above 2^53); timestamp (NTZ or LTZ) → unix_millis after
    * a cast that is exact under the UTC session timezone.
    */
  def tsMid(df: DataFrame): org.apache.spark.sql.Column =
    df.schema("ts").dataType match {
      case LongType => expr("ts div 1000000")
      case _        => unix_millis(col("ts").cast(TimestampType))
    }

  // mid is derived from ts — give the scan a pushable bound on the
  // PHYSICAL ts column (typed to match it) so Parquet row-group stats
  // prune time; a bound on the derived mid alone would not reach the
  // scan.
  private def tsPredicate(dt: DataType): (Long, Long) => org.apache.spark.sql.Column = {
    def bound(ms: Long, endOfMs: Boolean): org.apache.spark.sql.Column = dt match {
      case LongType => lit(ms * 1000000L + (if (endOfMs) 999999L else 0L))
      case TimestampNTZType => lit(java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochMilli(ms).plusNanos(if (endOfMs) 999999L else 0L),
        java.time.ZoneOffset.UTC))
      case _ => lit(java.time.Instant.ofEpochMilli(ms)
        .plusNanos(if (endOfMs) 999999L else 0L))
    }
    (fromMs, toMs) => col("ts") >= bound(fromMs, endOfMs = false) &&
      col("ts") <= bound(toMs, endOfMs = true)
  }

  def eventsDocs(spark: SparkSession, sfDir: String): DocsTable = {
    val src = raw(spark, sfDir, "events")
    val df = src
      .withColumn("mid", tsMid(src))
      .withColumn("rid", col("event_id"))
      .withColumn("props_k",
        when(regexp_extract(col("props"), "\"k\": (\\d+)", 1) === "", lit(null))
          .otherwise(regexp_extract(col("props"), "\"k\": (\\d+)", 1)))
      .withColumn("value_cents", expr("CAST(round(value * 100) AS BIGINT)"))
    DocsTable(df, eventsMapping, columnOverrides = Map("props.k" -> "props_k"),
      timePredicate = Some(tsPredicate(src.schema("ts").dataType)))
  }

  /** Cache key for /tmp materializations: identity + size + mtime of
    * the source parquet, so a regenerated (or same-named but
    * different) dataset never reuses a stale copy.
    */
  private[tables] def sourceFingerprint(sfDir: String, table: String): String = {
    val src = new java.io.File(s"$sfDir/$table.parquet")
    java.lang.Long.toHexString(
      src.getAbsolutePath.hashCode.toLong * 1000003L + src.length() * 31L + src.lastModified())
  }

  /** Materialize the day-partitioned events copy once per (SF, source
    * fingerprint) and make sure each requested field has a Bloom
    * sidecar (fields are added lazily as queries need them).
    */
  private def ensureEventsBloomTable(spark: SparkSession, sfDir: String,
      fields: Seq[String]): String = {
    // v2 layout: cluster each day's files by user_id (range partition
    // on (date, user_id) before the partitioned write) and scale the
    // file census with the corpus. A selective entity token then
    // concentrates in ~1 file per day, so the Bloom file-skip RATIO
    // improves as files multiply instead of collapsing — PruningProbe
    // r16 measured the unclustered layout scanning 27/30 files at the
    // 10x replica (user tokens spread across every file; skip held at
    // sf5 only by replica-locality luck). Ingest-time clustering on
    // the lookup entity is the 100 TB design: the sealed-index
    // analogue of the reference's per-fraction token dict selectivity.
    val path = s"${graft.GraftTmp.dir}/graft_bloom_events_v2_${new java.io.File(sfDir).getName}_" +
      sourceFingerprint(sfDir, "events")
    TestTables.synchronized {
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        val df = eventsDocs(spark, sfDir).df
          .withColumn("date", to_date(timestamp_millis(col("mid"))))
        val nFiles = math.max(32L, df.count() / 31250L).toInt
        df.repartitionByRange(nFiles, col("date"), col("user_id"))
          .write.mode("overwrite").partitionBy("date").parquet(path)
      }
      val missing = fields.filterNot(f =>
        new java.io.File(s"$path/_bloom/field=$f/_SUCCESS").exists())
      if (missing.nonEmpty)
        graft.index.TokenBloomIndex.build(spark, path, eventsMapping, missing)
    }
    path
  }

  private def eventsTableOver(df: org.apache.spark.sql.DataFrame): DocsTable =
    DocsTable(df, eventsMapping, columnOverrides = Map("props.k" -> "props_k"),
      timePredicate = Some(tsPredicate(df.schema("ts").dataType)))

  /** The events docs table in the at-scale layout: a day-partitioned
    * parquet copy with a token-Bloom sidecar over the selective lookup
    * fields (graft.index.TokenBloomIndex — the sealed-index analogue).
    * Materialized once per SF under /tmp; `query`'s conjunctively
    * required tokens then prune the FILE LIST before the scan, so a
    * needle query touches only the files that can contain it.
    */
  def eventsDocsBloom(spark: SparkSession, sfDir: String, query: String): DocsTable = {
    val path = ensureEventsBloomTable(spark, sfDir, Seq("user_id", "event_type"))
    eventsTableOver(
      graft.index.TokenBloomIndex.prunedRead(spark, path, query, eventsMapping))
  }

  /** Point-lookup (Fetch) variant: disjunctive Bloom pruning on the
    * event_id — a batch of ids touches only the files whose id token
    * set can contain one of them (S5's "ids → fraction" narrowing).
    */
  def eventsDocsFetchBloom(spark: SparkSession, sfDir: String, rids: Seq[Long]): DocsTable = {
    val path = ensureEventsBloomTable(spark, sfDir, Seq("event_id"))
    eventsTableOver(graft.index.TokenBloomIndex.prunedReadAny(
      spark, path, "event_id", rids.map(_.toString)))
  }

  /** Query the persisted cell-partitioned IVF index over the
    * embeddings table (built once per (SF, source fingerprint) —
    * Similarity.buildIvfIndex); identical results to the retrain-per-
    * call ivfTopK, but the scan opens only the probed cell partitions.
    */
  def embeddingsIvfTopK(spark: SparkSession, sfDir: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val path = s"${graft.GraftTmp.dir}/graft_ivf_${new java.io.File(sfDir).getName}_" +
      sourceFingerprint(sfDir, "embeddings")
    TestTables.synchronized {
      if (!new java.io.File(s"$path/points/_SUCCESS").exists())
        graft.dataprep.Similarity.buildIvfIndex(
          embeddings(spark, sfDir), "vec_id", "embedding", path,
          nCells = 16, trainIters = 2)
    }
    graft.dataprep.Similarity.ivfTopKIndexed(spark, path, queryIds, k, nProbe = 4)
  }

  /** Incremental near-dup: the "old" corpus (doc_id % 5 != 0) indexed
    * once into a persisted MinHash band index; the "new" batch
    * (doc_id % 5 == 0) probed against it. Index build is amortized
    * write-path cost, cached per (sf, source mtime) like the other
    * index fixtures.
    */
  def documentsIncrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    // the family version is part of the cache key: band keys from an
    // older hash family would probe to zero candidates
    val path = s"${graft.GraftTmp.dir}/graft_mhidx_v${graft.functions.MinHashCoefficients.familyVersion}_" +
      s"${new java.io.File(sfDir).getName}_" + sourceFingerprint(sfDir, "documents")
    TestTables.synchronized {
      if (!new java.io.File(s"$path/bands/_SUCCESS").exists())
        graft.dataprep.Dedup.buildMinhashIndex(
          documents(spark, sfDir).where(col("doc_id") % 5 =!= 0),
          "doc_id", "text", numHashes = 128, bands = 32, indexPath = path)
    }
    graft.dataprep.Dedup.dedupAgainstIndex(
      documents(spark, sfDir).where(col("doc_id") % 5 === 0),
      "doc_id", "text", numHashes = 128, bands = 32,
      thresholdNum = 1, thresholdDen = 2, indexPath = path)
  }

  /** Incremental substring dedup: winnowed-window index over docs with
    * doc_id % 5 != 0, batch = the rest — same split as
    * [[documentsIncrementalDedup]]. */
  def documentsIncrementalSubstring(spark: SparkSession, sfDir: String): DataFrame = {
    // v2: the win column is the 16-byte winnowed digest (binary), no
    // longer the substring — a stale unversioned index would silently
    // join zero rows against a binary probe.
    // v3: indexes now carry a _graft_index_format.json marker the
    // probe validates; a cached marker-less v2 tree would fail fast.
    val path = s"${graft.GraftTmp.dir}/graft_ssidx_v3_${new java.io.File(sfDir).getName}_" +
      sourceFingerprint(sfDir, "documents")
    TestTables.synchronized {
      if (!new java.io.File(s"$path/wins/_SUCCESS").exists())
        graft.dataprep.Dedup.buildSubstringIndex(
          documents(spark, sfDir).where(col("doc_id") % 5 =!= 0),
          "doc_id", "text", k = 24, w = 8, indexPath = path)
    }
    graft.dataprep.Dedup.substringDedupAgainstIndex(
      documents(spark, sfDir).where(col("doc_id") % 5 === 0),
      "doc_id", "text", k = 24, w = 8, indexPath = path, maxDf = 50L)
  }

  /** BPE merges trained once per sfDir and shared by the merges/apply
    * gate queries (training is a driver-coordinated loop, so the
    * result is a plain value, cached like the sidecar indexes).
    */
  private val bpeCache =
    scala.collection.concurrent.TrieMap[String, Seq[(String, String)]]()
  def bpeMerges(spark: SparkSession, sfDir: String): Seq[(String, String)] =
    bpeCache.getOrElseUpdate(sfDir,
      graft.dataprep.CorpusStats.bpeTrainMerges(
        documents(spark, sfDir), "text", nMerges = 8))

  /** Incremental span removal: batch docs (doc_id % 5 == 0) rewritten
    * against the full-window removal index of the rest of the corpus.
    */
  def documentsIncrementalRemoval(spark: SparkSession, sfDir: String): DataFrame = {
    // v2: the removal index moved to an allwins/batch=base layout; an
    // unversioned path could leave a pre-change index's files at the
    // allwins/ root next to a freshly written batch=base dir, which
    // spark.read then rejects as conflicting directory structures.
    // v3: the win column is a 16-byte fingerprint (binary), no longer
    // the substring — a stale v2 index would fail the probe's schema.
    // v4: indexes now carry a _graft_index_format.json marker the
    // probe validates; a cached marker-less v3 tree would fail fast.
    val path = s"${graft.GraftTmp.dir}/graft_rmidx_v4_${new java.io.File(sfDir).getName}_" +
      sourceFingerprint(sfDir, "documents")
    TestTables.synchronized {
      if (!new java.io.File(s"$path/allwins/batch=base/_SUCCESS").exists())
        graft.dataprep.Dedup.buildRemovalIndex(
          documents(spark, sfDir).where(col("doc_id") % 5 =!= 0),
          "doc_id", "text", k = 24, indexPath = path)
    }
    graft.dataprep.Dedup.removeSpansAgainstIndex(
      documents(spark, sfDir).where(col("doc_id") % 5 === 0),
      "doc_id", "text", k = 24, indexPath = path)
  }

  /** documents docs table materialized with Bloom sidecars over the
    * text tokens, source path prefixes and language — the sealed-index
    * analogue for the corpus table (see [[eventsDocsBloom]]).
    */
  def documentsDocsBloom(spark: SparkSession, sfDir: String, query: String): DocsTable = {
    val (path, mapping) = ensureDocumentsBloomTable(spark, sfDir)
    val df = graft.index.TokenBloomIndex.prunedRead(spark, path, query, mapping)
    DocsTable(df, mapping)
  }

  private def ensureDocumentsBloomTable(spark: SparkSession,
      sfDir: String): (String, SeqMapping) = {
    val base = documentsDocs(spark, sfDir)
    // v2 layout: cluster by (src_path, doc_id) and scale the file
    // census with the corpus. Common-word text tokens live in every
    // file at any scale — what makes a conjunctive phrase query
    // file-prunable is its SELECTIVE conjunct (the source path), and
    // only if the layout clusters it: the old fixed-8-file doc_id
    // layout scanned 8/8 at every sf (PruningProbe r16). With source
    // clustering the src_path sidecar narrows to the ~1/20 of files
    // holding that source and the intersection with the text sidecar
    // inherits the selectivity, a ratio that HOLDS as files multiply.
    val path = s"${graft.GraftTmp.dir}/graft_bloom_docs_v2_${new java.io.File(sfDir).getName}_" +
      sourceFingerprint(sfDir, "documents")
    TestTables.synchronized {
      if (!new java.io.File(s"$path/_bloom/field=text/_SUCCESS").exists()) {
        val nFiles = math.max(8L, base.df.count() / 25000L).toInt
        base.df.repartitionByRange(nFiles, col("src_path"), col("doc_id"))
          .write.mode("overwrite").parquet(path)
        graft.index.TokenBloomIndex.build(spark, path, base.mapping,
          Seq("text", "src_path", "lang"))
      }
    }
    (path, base.mapping)
  }

  /** The bloom-copy events table WITHOUT file pruning — the probe's
    * control leg: same files, same engine; the only difference from
    * [[eventsDocsBloom]] is the sidecar file-list narrowing
    * (tools.PruningProbe). */
  def eventsDocsBloomUnpruned(spark: SparkSession, sfDir: String): DocsTable = {
    val path = ensureEventsBloomTable(spark, sfDir, Seq("user_id", "event_type"))
    eventsTableOver(spark.read.parquet(path))
  }

  /** [[documentsDocsBloom]] without the file pruning (control leg). */
  def documentsDocsBloomUnpruned(spark: SparkSession, sfDir: String): DocsTable = {
    val (path, mapping) = ensureDocumentsBloomTable(spark, sfDir)
    DocsTable(spark.read.parquet(path), mapping)
  }

  /** Scanned-vs-total data-file counts for the three file-skipping
    * gate rows, over the SAME fixtures and probe values those rows
    * run on (seq_search_keyword_bloom, seq_text_bloom,
    * events_zorder_lookup). This is the pruning-effectiveness claim
    * behind the full-text-at-scale story (reference analogue:
    * fraction pruning, seq-db fracmanager/searcher.go:89-101):
    * the row-count evidence is only meaningful if the file-skip ratio
    * HOLDS as the corpus (and its file census) grows — probed by
    * tools.PruningProbe at sf0.1/sf1/sf5.
    * Returns (row, scannedFiles, totalFiles).
    */
  def pruningStats(spark: SparkSession, sfDir: String): Seq[(String, Int, Int)] = {
    import graft.index.{TokenBloomIndex, ZoneMapIndex}
    val evPath = ensureEventsBloomTable(spark, sfDir, Seq("user_id", "event_type"))
    val evAll = spark.read.parquet(evPath).inputFiles.length
    val evScan = TokenBloomIndex.candidateFiles(spark, evPath,
      TokenBloomIndex.requiredTokens("user_id:42 and event_type:error", eventsMapping))
      .fold(evAll)(_.size)
    val (docPath, docMapping) = ensureDocumentsBloomTable(spark, sfDir)
    val docAll = spark.read.parquet(docPath).inputFiles.length
    val docScan = TokenBloomIndex.candidateFiles(spark, docPath,
      TokenBloomIndex.requiredTokens("text:'key order' and src_path:/src7", docMapping))
      .fold(docAll)(_.size)
    val zPath = eventsZOrderedPath(spark, sfDir)
    val zAll = spark.read.parquet(zPath).inputFiles.length
    // same (entity, time window) probe as the events_zorder_lookup row
    val zScan = ZoneMapIndex.candidateFiles(spark, zPath, Map(
      "user_id" -> (Some(42L), Some(42L)),
      "mid"     -> (Some(1704067200000L), Some(1705276800000L))))
      .fold(zAll)(_.size)
    Seq(("seq_search_keyword_bloom", evScan, evAll),
        ("seq_text_bloom", docScan, docAll),
        ("events_zorder_lookup", zScan, zAll))
  }

  /** documents → docs: no natural event time, so mid = doc_id (stable,
    * unique); `text` is text-indexed with precomputed tokens; `src_path`
    * synthesizes a path-indexed field `/source/lang`.
    */
  def documentsDocs(spark: SparkSession, sfDir: String): DocsTable = {
    val df = raw(spark, sfDir, "documents")
      .withColumn("mid", col("doc_id"))
      .withColumn("rid", col("doc_id"))
      .withColumn("text__tokens", Tokenizers.textTokens(col("text"), caseSensitive = false))
      .withColumn("src_path", concat(lit("/"), col("source"), lit("/"), col("lang")))
    val mapping = SeqMapping.of(
      "doc_id"  -> IndexType.Keyword,
      "text"    -> IndexType.Text,
      "lang"    -> IndexType.Keyword,
      "source"  -> IndexType.Keyword,
      "n_chars" -> IndexType.Keyword,
      "src_path"-> IndexType.Path,
    ).copy(caseSensitive = true)
    DocsTable(df, mapping)
  }

  /** Z-ordered (user_id, mid) events copy with a zone-map sidecar
    * (graft.ingest.ZOrder + graft.index.ZoneMapIndex): the multi-dim
    * data-skipping layout for the (entity, time) needle pattern the
    * reference cannot prune (its fractions bound only time).
    * Materialized once per (SF, source fingerprint), like the Bloom
    * copies.
    */
  def eventsZOrderedPath(spark: SparkSession, sfDir: String): String = {
    val path = s"${graft.GraftTmp.dir}/graft_zorder_events_v2_${new java.io.File(sfDir).getName}_" +
      sourceFingerprint(sfDir, "events")
    TestTables.synchronized {
      if (!new java.io.File(s"$path/_SUCCESS").exists()) {
        // explicit file count: the test SFs are small enough that AQE
        // would coalesce to one file and leave nothing to prune. v2:
        // the census scales with the corpus (same rate as the Bloom
        // copy) so the scale probes exercise a realistic file
        // multiplication, not 50x-fatter files behind a fixed count.
        val df = eventsDocs(spark, sfDir).df
        graft.ingest.ZOrder.writeClustered(
          df, "user_id", "mid", path,
          numFiles = Some(math.max(32L, df.count() / 31250L).toInt))
      }
    }
    path
  }

  /** (entity, time) needle over the Z-ordered copy: the zone-map
    * sidecar prunes the file list on BOTH user_id and mid before the
    * scan; the row-level predicate is applied on top (pruning is an
    * over-approximation, same contract as fraction time bounds).
    */
  def eventsZOrderLookup(spark: SparkSession, sfDir: String,
      userId: Long, fromMs: Long, toMs: Long): DataFrame = {
    val path = eventsZOrderedPath(spark, sfDir)
    graft.index.ZoneMapIndex.prunedRead(spark, path, Map(
        "user_id" -> (Some(userId), Some(userId)),
        "mid"     -> (Some(fromMs), Some(toMs))))
      .where(col("user_id") === userId && col("mid").between(fromMs, toMs))
  }

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    raw(spark, sfDir, "embeddings")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = raw(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = raw(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = raw(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = raw(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = raw(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = raw(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame = raw(spark, sfDir, "part")
  def documents(spark: SparkSession, sfDir: String): DataFrame = raw(spark, sfDir, "documents")
}
