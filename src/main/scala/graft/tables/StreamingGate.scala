package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate adapters that drive the STATIC test corpus through the real
  * Structured Streaming operators in micro-batch and hand the sink
  * back as a batch DataFrame, so the streaming family answers to the
  * same DuckDB oracle as everything else. The reference's ingest path
  * is its most-used surface (seq-db `proxy/bulk/ingestor.go:1-323` —
  * every log line traverses it); these rows make the streaming
  * composition's correctness driver-hard instead of ScalaTest-only.
  *
  * Determinism: the corpus is written as single-file parquet slices
  * in key order with strictly increasing, FIXED modification times,
  * and the file source replays them oldest-first one file per
  * trigger, so batch boundaries and arrival order are reproducible
  * run-to-run. The ntile slicing is gate plumbing over a bounded
  * corpus, not a scale operator — at 100 TB the stream IS the arrival
  * order and no slicing exists.
  *
  * Stateful output in Append mode only emits on PROOF of closure, so
  * each adapter flushes state the way a production stream would see
  * it: sessionize appends a per-user sentinel event one gap past the
  * corpus (closing every real session), the watermarked counts append
  * two far-future sentinel batches (the first advances the watermark
  * past every real window, the second triggers their emission);
  * sentinel rows are filtered from the returned frame and never
  * reach the oracle comparison.
  */
object StreamingGate {

  /** Gate scratch root: prefer a memory-backed mount when one exists.
    * The streaming path's checkpoint/state writes are fsync-per-batch
    * (offsets, commits, per-partition state snapshots) — on a
    * credit-throttled cloud disk those small synced writes drain the
    * write-credit bucket mid-sweep and every later row that spills to
    * the same device pays for it. At production scale the checkpoint
    * targets HDFS/S3, never the local disk, so tmpfs is the faithful
    * stand-in, not a shortcut. GRAFT_TMP still wins when set.
    */
  private lazy val scratch: String =
    if (graft.GraftTmp.overridden) graft.GraftTmp.dir
    else {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) "/dev/shm" else graft.GraftTmp.dir
    }

  private def freshDir(spark: SparkSession, tag: String, sfDir: String): String = {
    val d = s"$scratch/graft_sgate_${tag}_${new java.io.File(sfDir).getName}"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    d
  }

  /** Persistent per-(sf, source fingerprint) fixture dir for gate rows
    * that amortize an index build across calls. Stale entries are
    * deleted on the way in: the scratch root is usually RAM-backed
    * (/dev/shm), and without cleanup every testdata regeneration would
    * leak a full index into tmpfs until reboot, competing with the JVM
    * heap. The sweep covers the whole TAG, not just same-sf siblings:
    * an entry is stale when (a) it shares this sf with an older source
    * fingerprint, or (b) the source dir it was built from no longer
    * exists (recorded in an `_SFDIR` sidecar at build time — a torn-
    * down sf5/sf10 replica would otherwise strand its fixture in tmpfs
    * until reboot). Fixtures of OTHER sfs whose source is still on
    * disk are kept — alternating sf0.01 verify / sf0.1 bench runs must
    * not thrash each other's indexes.
    */
  private def persistentDir(spark: SparkSession, tag: String, sfDir: String,
      table: String): String = {
    val tagPrefix = s"graft_sgate_${tag}_"
    val sfPrefix = tagPrefix + new java.io.File(sfDir).getName + "_"
    val want = sfPrefix + TestTables.sourceFingerprint(sfDir, table)
    Option(new java.io.File(scratch).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(tagPrefix) && f.getName != want)
      .foreach { f =>
        // a corrupt/unreadable sidecar means the fixture's provenance
        // is unknowable — treat it as stale (delete + rebuild) rather
        // than letting the exception escape and fail the gate row
        val sourceAlive = !f.getName.startsWith(sfPrefix) &&
          scala.util.Try {
            val sidecar = new java.io.File(f, "_SFDIR")
            sidecar.isFile && {
              val src = scala.io.Source.fromFile(sidecar)(scala.io.Codec.UTF8)
              val rec = try src.mkString.trim finally src.close()
              rec.nonEmpty && new java.io.File(rec).isDirectory
            }
          }.getOrElse(false)
        if (!sourceAlive) {
          val p = new org.apache.hadoop.fs.Path(f.getAbsolutePath)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
        }
      }
    val d = new java.io.File(scratch, want)
    d.mkdirs(): Unit
    val sidecar = new java.io.File(d, "_SFDIR")
    if (!sidecar.isFile) {
      val w = new java.io.PrintWriter(sidecar, "UTF-8")
      try w.print(new java.io.File(sfDir).getAbsolutePath) finally w.close()
    }
    s"$scratch/$want"
  }

  /** `df` as a file-source stream of `nSlices` single-file batches in
    * `orderCol` order, followed by `extraSlices` (same schema) — one
    * micro-batch per file under `maxFilesPerTrigger = 1`, replayed
    * oldest-mtime-first.
    */
  private def orderedFileStream(df: DataFrame, orderCol: String,
      nSlices: Int, dir: String,
      extraSlices: Seq[DataFrame] = Nil): DataFrame = {
    val spark = df.sparkSession
    val inPath = new org.apache.hadoop.fs.Path(s"$dir/in")
    val fs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(inPath): Unit
    // adopt a staged part file as slice i: strictly increasing FIXED
    // mtimes pin replay order (the file source orders by modification
    // time) and keep reruns identical
    def adopt(part: org.apache.hadoop.fs.Path, i: Int): Unit = {
      val dst = new org.apache.hadoop.fs.Path(inPath, f"slice-$i%03d.parquet")
      fs.rename(part, dst): Unit
      fs.setTimes(dst, 1700000000000L + i * 10000L, -1L)
    }
    def partFile(d: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path = {
      val parts = fs.listStatus(d).map(_.getPath).filter(_.getName.startsWith("part-"))
      // a slice IS one file by construction (single-task window / an
      // explicit coalesce(1)); a plan or maxRecordsPerFile change that
      // split it would silently drop rows from the batch
      require(parts.length == 1,
        s"expected exactly 1 part file in $d, got ${parts.length}")
      parts.head
    }
    val stage = new org.apache.hadoop.fs.Path(s"$dir/stage")
    if (nSlices <= 1) {
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      adopt(partFile(stage), 0)
    } else {
      // deliberate bounded global window over the gate corpus; the
      // constant partition key keeps it explicit (see the
      // EliminateWindowPartitions note in Bench/Verify builders).
      // ONE partitionBy("__b") write stages every slice in a single
      // job — per-slice filtered writes used to re-execute the corpus
      // scan AND the single-task window sort once per slice (slice
      // membership, which is all replay semantics depend on, is
      // unchanged; __b is a partition directory, so the staged files
      // carry exactly df's schema). Batch content is a SET — intra-
      // file row order is not part of any gate relation.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(0)).orderBy(col(orderCol))
      df.withColumn("__b", ntile(nSlices).over(w))
        .write.mode("overwrite").partitionBy("__b").parquet(stage.toString)
      (1 to nSlices).foreach { i =>
        val d = new org.apache.hadoop.fs.Path(stage, s"__b=$i")
        if (fs.exists(d)) adopt(partFile(d), i - 1)
        else {
          // fewer rows than slices: ntile left bucket i empty and the
          // partitioned write created no directory — stage an empty
          // single-file slice so the stream still replays nSlices
          // batches (the old per-slice path wrote an empty file here)
          val empty = new org.apache.hadoop.fs.Path(s"$dir/stage_empty$i")
          df.limit(0).coalesce(1).write.mode("overwrite").parquet(empty.toString)
          adopt(partFile(empty), i - 1)
          fs.delete(empty, true): Unit
        }
      }
    }
    fs.delete(stage, true): Unit
    val base = math.max(nSlices, 1)
    extraSlices.zipWithIndex.foreach { case (s, j) =>
      val extraStage = new org.apache.hadoop.fs.Path(s"$dir/stage_x$j")
      s.coalesce(1).write.mode("overwrite").parquet(extraStage.toString)
      adopt(partFile(extraStage), base + j)
      fs.delete(extraStage, true): Unit
    }
    spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in")
  }

  // Measured r14: running the gate queries at shuffle.partitions=8
  // instead of the session's 32 (fewer state-store instances and
  // per-batch fsyncs) does NOT reduce wall time — the per-batch cost
  // is job-DAG latency (offset/commit log round-trips, job scheduling
  // per micro-batch), not per-partition state overhead. Reverted;
  // plumbing_floors_s in BENCH_REF.json remains the honest
  // decomposition of machinery vs operator.
  private def runToCompletion(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    try q.processAllAvailable()
    finally {
      q.stop(); q.awaitTermination()
      // unload the stopped query's state-store providers NOW instead
      // of waiting for the maintenance interval — a gate query must
      // not leave executor-memory state behind for the next timed row
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case _: Throwable => () }
    }

  /** Sink a streamed frame to per-batch parquet partitions (the same
    * replay-idempotent layout the streaming operators themselves use)
    * and run the query to completion.
    */
  private def sinkToParquet(streamed: DataFrame, out: String,
      ckpt: String): Unit = {
    val q = streamed.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$out/batch=$id")
        ()
      }
      .start()
    runToCompletion(q)
  }

  /** Exact first-wins streaming dedup over the documents corpus in
    * three id-ordered micro-batches: with arrival in id order,
    * first-wins equals min-id-per-content-group, so the survivors are
    * exactly the batch [[graft.dataprep.Dedup.exactGroups]] keepers —
    * the relation the oracle states directly in SQL.
    */
  def documentsStreamDedup(spark: SparkSession, sfDir: String): DataFrame =
    TestTables.synchronized {
      val all = TestTables.documents(spark, sfDir)
      val dir = freshDir(spark, "dedup", sfDir)
      val stream = orderedFileStream(
        all.select(col("doc_id"), col("text")), "doc_id", 3, dir)
      sinkToParquet(
        graft.streaming.StreamingDedup.fromDocs(stream, "doc_id", "text").toDF(),
        s"$dir/out", s"$dir/ckpt")
      val survivors = spark.read.parquet(s"$dir/out")
        .where(col("is_first")).select(col("id").as("doc_id"))
      all.join(survivors, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    }

  /** Streaming near-dedup of the incremental batch (doc_id % 5 == 0)
    * against a MinHash band index of the rest of the corpus — the
    * same split [[TestTables.documentsIncrementalDedup]] stands on,
    * pushed through the real writeStream/foreachBatch/index path.
    * Survivors = batch docs that are neither the larger side of an
    * in-batch near-dup pair nor near-dups of any indexed doc; both
    * relations are exact-verified Jaccard >= 1/2 with the length
    * block, which the oracle replays literally.
    */
  def documentsStreamNearDedup(spark: SparkSession, sfDir: String): DataFrame =
    TestTables.synchronized {
      val all = TestTables.documents(spark, sfDir)
      // history index built once per (sf, source fingerprint) — the
      // same amortized-build rationale as the other index fixtures;
      // what each call re-runs is the STREAM: slice write, probe,
      // sink, index append. The base lives under batch=base so the
      // stream's own batch=<id> appends coexist with it, and each
      // call deletes every non-base batch partition (a leftover
      // append would make the batch docs match THEMSELVES on rerun).
      val dir = persistentDir(spark, "neardedup", sfDir, "documents")
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val idx = s"$dir/idx"
      if (!new java.io.File(s"$idx/bands/batch=base/_SUCCESS").exists())
        graft.dataprep.Dedup.buildMinhashIndex(
          all.where(col("doc_id") % 5 =!= 0), "doc_id", "text",
          numHashes = 128, bands = 32, indexPath = idx,
          partition = Some("batch=base"))
      Seq("bands", "shingles").foreach { sub =>
        val d = new org.apache.hadoop.fs.Path(s"$idx/$sub")
        if (fs.exists(d))
          fs.listStatus(d)
            .filter(st => st.isDirectory && st.getPath.getName != "batch=base")
            .foreach(st => fs.delete(st.getPath, true): Unit)
      }
      Seq("in", "out", "ckpt").foreach(s =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$s"), true): Unit)
      val stream = orderedFileStream(
        all.where(col("doc_id") % 5 === 0).select(col("doc_id"), col("text")),
        "doc_id", 1, dir)
      val q = graft.streaming.StreamingNearDedup.start(
        stream, "doc_id", "text",
        indexPath = s"$dir/idx", outPath = s"$dir/out",
        checkpointPath = s"$dir/ckpt", triggerMs = 50)
      runToCompletion(q)
      val survivors = spark.read.parquet(s"$dir/out").select(col("doc_id"))
      all.join(survivors, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    }

  /** No-op twin of a streaming gate row: the SAME corpus read, slice
    * layout, fixed-mtime file-source replay, sentinel batches,
    * foreachBatch parquet sink, per-batch checkpoint fsyncs and
    * state-store teardown — with the IDENTITY transform in place of
    * the streaming operator. Timing this isolates the gate's plumbing
    * cost from the operator's: BENCH_REF.json pins these as
    * `plumbing_floors_s`, so a future regression in a gate row can be
    * attributed to "the streaming machinery got slower" vs "the
    * operator regressed" (VERDICT r13 What's-wrong #2). Returns the
    * sink row count (consumes the result like the real rows do).
    */
  def plumbingFloor(name: String, spark: SparkSession, sfDir: String): Long =
    TestTables.synchronized {
      val dir = freshDir(spark, s"floor_$name", sfDir)
      val streamed: DataFrame = name match {
        case "dp_stream_dedup" =>
          orderedFileStream(
            TestTables.documents(spark, sfDir).select(col("doc_id"), col("text")),
            "doc_id", 3, dir)
        case "dp_stream_neardedup" | "dp_stream_spanremove" =>
          orderedFileStream(
            TestTables.documents(spark, sfDir)
              .where(col("doc_id") % 5 === 0).select(col("doc_id"), col("text")),
            "doc_id", 1, dir)
        case "dp_stream_sessionize" =>
          val gapMs = 1800000L
          val base = TestTables.eventsDocs(spark, sfDir).df
            .where(col("user_id").isNotNull)
            .select(col("user_id").cast("long").as("user_id"),
              col("mid").cast("long").as("mid"))
          // mirrors the gate row's collected-max sentinel (one scan)
          val mxRow = base.agg(max(col("mid")).as("__mx")).head()
          val mxv: Long = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
          val sentinel = base.select(col("user_id")).distinct()
            .select(col("user_id"), lit(mxv + gapMs + 1000L).as("mid"))
          orderedFileStream(base, "mid", 3, dir, extraSlices = Seq(sentinel))
        case "seq_stream_livecount" =>
          val dayMs = 86400000L
          val base = TestTables.eventsDocs(spark, sfDir).df
            .select(col("mid").cast("long").as("mid"),
              col("event_type").cast("string").as("event_type"))
          // mirrors the gate row's collected-max sentinel (one scan)
          val mxRow = base.agg(max(col("mid")).as("__mx")).head()
          val mxv: Long = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
          def sentinel(offset: Long) = base.sparkSession.range(1).select(
            lit(mxv + offset).as("mid"),
            lit("__sentinel").as("event_type"))
          orderedFileStream(base, "mid", 3, dir,
            extraSlices = Seq(sentinel(10 * dayMs), sentinel(20 * dayMs)))
        case "seq_stream_follow" =>
          val base = TestTables.eventsDocs(spark, sfDir).df
          val lines = base.select(
            to_json(struct(
              date_format(timestamp_millis(col("mid")),
                "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("ts"),
              col("event_id").cast("string").as("event_id"),
              col("event_type"),
              col("value"))).as("value"),
            col("mid"))
          orderedFileStream(lines, "mid", 3, dir).drop("mid")
        case other =>
          throw new IllegalArgumentException(s"no plumbing floor twin for $other")
      }
      sinkToParquet(streamed, s"$dir/out", s"$dir/ckpt")
      spark.read.parquet(s"$dir/out").count()
    }

  /** Streaming duplicate-span removal of the incremental batch
    * (doc_id % 5 == 0) against the full-window removal index of the
    * rest of the corpus — [[TestTables.documentsIncrementalRemoval]]'s
    * split pushed through the real
    * [[graft.streaming.StreamingSpanRemoval]] pipeline (one micro-
    * batch: index rewrite, then batch-internal first-occurrence
    * rewrite, then sink + replay-idempotent index append). The oracle
    * replays BOTH stages position-by-position: stage 1 excises batch
    * chars covered by any index window, stage 2 excises chars of the
    * stage-1 text covered by a window whose min owner within the
    * batch is an earlier doc.
    */
  def documentsStreamSpanRemoval(spark: SparkSession, sfDir: String): DataFrame =
    TestTables.synchronized {
      val all = TestTables.documents(spark, sfDir)
      // history index amortized per (sf, fingerprint), like near-dedup;
      // the timed path is slice write + two-stage rewrite + sink +
      // index append. The base partition holds the rest-corpus windows;
      // every non-base batch partition is deleted per call (a leftover
      // append would make reruns excise against the batch itself).
      val dir = persistentDir(spark, "spanremove", sfDir, "documents")
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val idx = s"$dir/idx"
      if (!new java.io.File(s"$idx/allwins/batch=base/_SUCCESS").exists())
        graft.dataprep.Dedup.buildRemovalIndex(
          all.where(col("doc_id") % 5 =!= 0), "doc_id", "text",
          k = 24, indexPath = idx)
      val wins = new org.apache.hadoop.fs.Path(s"$idx/allwins")
      if (fs.exists(wins))
        fs.listStatus(wins)
          .filter(st => st.isDirectory && st.getPath.getName != "batch=base")
          .foreach(st => fs.delete(st.getPath, true): Unit)
      Seq("in", "out", "ckpt").foreach(s =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$s"), true): Unit)
      val stream = orderedFileStream(
        all.where(col("doc_id") % 5 === 0).select(col("doc_id"), col("text")),
        "doc_id", 1, dir)
      val q = graft.streaming.StreamingSpanRemoval.start(
        stream, "doc_id", "text",
        indexPath = idx, outPath = s"$dir/out",
        checkpointPath = s"$dir/ckpt", k = 24, triggerMs = 50)
      runToCompletion(q)
      spark.read.parquet(s"$dir/out")
        .select(col("doc_id"), col("n_chars"), col("n_removed"), col("clean_text"))
        .orderBy(col("doc_id"))
    }

  /** Live follow-search over the events table replayed as a raw-JSON
    * line stream in three time-ordered micro-batches through the real
    * [[graft.streaming.StreamingSearch.follow]] path (the same seq-ql
    * compiler + ingest projection as the batch engine, reference
    * semantics: tailing = re-querying the active fraction,
    * docs/en/internal/fractions.md). The filter is stateless, so the
    * union of the micro-batch outputs equals the batch filter; the
    * gate then takes the batch top-k over the sink — the ORDER
    * BY/LIMIT oracle the batch search rows already answer to. Drift
    * re-stamping (T2) is part of the checked relation: events older
    * than 24 h (or > 5 min future) of the request time are re-stamped
    * to it, which the oracle replays as a CASE.
    */
  def eventsStreamFollow(spark: SparkSession, sfDir: String): DataFrame =
    TestTables.synchronized {
      // 2024-01-15T00:00:00Z — mid-corpus, so BOTH drift legs fire:
      // two weeks of events precede the 24 h window and two weeks of
      // "future" events exceed the 5 min allowance
      val reqMs = 1705276800000L
      val base = TestTables.eventsDocs(spark, sfDir).df
      val lines = base.select(
        to_json(struct(
          date_format(timestamp_millis(col("mid")),
            "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("ts"),
          col("event_id").cast("string").as("event_id"),
          col("event_type"),
          col("value"))).as("value"),
        col("mid"))
      val dir = freshDir(spark, "follow", sfDir)
      val stream = orderedFileStream(lines, "mid", 3, dir).drop("mid")
      val mapping = graft.model.SeqMapping.of(
        "event_id"   -> graft.model.IndexType.Keyword,
        "event_type" -> graft.model.IndexType.Keyword,
        "value"      -> graft.model.IndexType.Keyword,
      ).copy(caseSensitive = true)
      val out = graft.streaming.StreamingSearch.follow(stream, mapping,
        "event_type:error and value:[10, *] | fields event_id, event_type, value",
        requestTimeMs = Some(reqMs))
      sinkToParquet(out, s"$dir/out", s"$dir/ckpt")
      spark.read.parquet(s"$dir/out")
        .select(col("mid").cast("long").as("mid"),
          col("event_id").cast("long").as("event_id"),
          col("event_type"),
          col("value").cast("double").as("value"))
        .orderBy(col("mid").desc, col("event_id").desc)
        .limit(500)
    }

  /** Streaming sessionization of the events table in three
    * time-ordered micro-batches, state flushed by one per-user
    * sentinel event a full gap past the corpus: every real session
    * closes and emits, so the output equals the batch
    * [[graft.dataprep.Sessionize.sessions]] rollup (minus the
    * sentinel sessions, which start after the corpus max and are
    * filtered).
    */
  def eventsStreamSessionize(spark: SparkSession, sfDir: String): DataFrame =
    TestTables.synchronized {
      val gapMs = 1800000L
      val base = TestTables.eventsDocs(spark, sfDir).df
        .where(col("user_id").isNotNull)
        .select(col("user_id").cast("long").as("user_id"),
          col("mid").cast("long").as("mid"))
      // collect the corpus max ONCE: the old plan re-derived it as an
      // agg subtree inside the sentinel write AND the final filter —
      // two extra corpus scans per call for the same literal value
      val mxRow = base.agg(max(col("mid")).as("__mx")).head()
      val mxv: Long = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
      val sentinel = base.select(col("user_id")).distinct()
        .select(col("user_id"), lit(mxv + gapMs + 1000L).as("mid"))
      val dir = freshDir(spark, "sessionize", sfDir)
      val stream = orderedFileStream(base, "mid", 3, dir,
        extraSlices = Seq(sentinel))
      sinkToParquet(
        graft.streaming.StreamingSessionize.fromDocs(stream, "user_id", gapMs).toDF(),
        s"$dir/out", s"$dir/ckpt")
      spark.read.parquet(s"$dir/out")
        .where(col("start_ms") <= mxv)
        .select(col("user").as("user_id"), col("start_ms"), col("end_ms"),
          col("n_events"))
        .orderBy(col("user_id"), col("start_ms"))
    }

  /** Watermarked live per-type daily counts over the events stream in
    * three time-ordered micro-batches plus two far-future sentinel
    * batches (watermark advance, then emission) — the streaming twin
    * of the A1/H1 count aggregation, equal to the batch GROUP BY over
    * the same rows once every real window has finalized.
    */
  def eventsStreamLiveCounts(spark: SparkSession, sfDir: String): DataFrame =
    TestTables.synchronized {
      val dayMs = 86400000L
      val base = TestTables.eventsDocs(spark, sfDir).df
        .select(col("mid").cast("long").as("mid"),
          col("event_type").cast("string").as("event_type"))
      // collect the corpus max ONCE (one scan) — each sentinel write
      // used to re-execute the max-agg subtree, a corpus scan per
      // sentinel for the same literal value
      val mxRow = base.agg(max(col("mid")).as("__mx")).head()
      val mxv: Long = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
      def sentinel(offset: Long) = base.sparkSession.range(1).select(
        lit(mxv + offset).as("mid"),
        lit("__sentinel").as("event_type"))
      val dir = freshDir(spark, "livecount", sfDir)
      val stream = orderedFileStream(base, "mid", 3, dir,
        extraSlices = Seq(sentinel(10 * dayMs), sentinel(20 * dayMs)))
      sinkToParquet(
        graft.streaming.LiveAggregates.liveCountByField(
          stream, "event_type", dayMs, lateness = "1 second"),
        s"$dir/out", s"$dir/ckpt")
      spark.read.parquet(s"$dir/out")
        .where(col("name") =!= "__sentinel")
        .select(col("bucket_ms"), col("name"), col("value"))
        .orderBy(col("bucket_ms"), col("name"))
    }
}
