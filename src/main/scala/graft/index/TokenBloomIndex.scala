package graft.index

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Tokenizers
import graft.model.{IndexType, SeqMapping}
import graft.seqql.{And, FullText, SeqAst, SeqQlParser}

/** Per-file token Bloom sidecar — the Spark-native analogue of the
  * reference's sealed-segment inverted index (SURVEY.md §2.1 S4,
  * frac/sealed_loader.go: token dict → LID lists). At 100 TB the
  * columnar engine's weakness vs a posting-list store is the selective
  * point lookup (`user_id:42`) over a long time range: partition/
  * row-group pruning bounds TIME but every surviving file still gets
  * scanned. This sidecar stores, per parquet file and indexed field, a
  * Bloom filter over the file's (folded) token set; a conjunctive
  * query then prunes the FILE LIST before the scan touches data —
  * million-file tables shrink to the handful of files that can match,
  * the same effect as the reference's token-dictionary narrowing but
  * without maintaining sorted posting lists on the write path.
  *
  * Layout: `<table>/_bloom/field=<name>/` (underscore-prefixed → the
  * main-table reader ignores it) with rows `(file, bits, num_bits,
  * num_hashes)`. Build is one distributed pass per field (groupBy
  * input file → bit-OR aggregate); the sidecar is ~KBs per file per
  * field and compresses well (sparse bitsets).
  *
  * Safety: pruning is advisory-only on the never-miss side — files not
  * present in the sidecar (e.g. appended after the last build) are
  * always kept, and a field without a sidecar simply doesn't prune.
  * Bloom false positives only add files back; they never drop a match.
  */
object TokenBloomIndex {

  val DefaultNumBits: Int = 1 << 18 // 32 KiB / file / field
  val DefaultNumHashes: Int = 5

  /** Double hashing (Kirsch–Mitzenmacher): pos_i = h1 + i*h2 (mod m).
    * Both halves are xxhash64 (Spark's seed-42 flavor + an independent
    * seed) so build and probe agree across JVMs.
    */
  def bitPositions(token: UTF8String, numBits: Int, numHashes: Int): Array[Int] = {
    val h1 = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      token, StringType, 42L)
    val h2 = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      token, StringType, 0x9E3779B9L)
    val out = new Array[Int](numHashes)
    var i = 0
    while (i < numHashes) {
      val h = h1 + i * h2
      out(i) = ((h % numBits + numBits) % numBits).toInt
      i += 1
    }
    out
  }

  def maybeContains(bits: Array[Long], numBits: Int, numHashes: Int, token: String): Boolean = {
    val ps = bitPositions(UTF8String.fromString(token), numBits, numHashes)
    ps.forall(p => (bits(p >>> 6) & (1L << (p & 63))) != 0)
  }

  /** The token stream for one field of the table, folded exactly like
    * the query side folds its probes: keyword → the (folded) value;
    * text → the token column (or derived tokens); path → all
    * `/`-boundary prefixes (tokenizer/path_tokenizer.go:33-71), so an
    * exact path probe hits when any doc lies under it.
    */
  private def tokensCol(df: DataFrame, mapping: SeqMapping, field: String): Column = {
    val spec = mapping.fields(field)
    def foldCol(c: Column): Column = if (mapping.caseSensitive) c else lower(c)
    spec.mainType match {
      case IndexType.Text =>
        val tokCol = field + "__tokens"
        if (df.columns.contains(tokCol)) col(tokCol)
        else Tokenizers.textTokens(col(field), mapping.caseSensitive)
      case IndexType.Path =>
        val c = foldCol(col(field).cast("string"))
        val parts = split(c, "/")
        when(size(parts) >= 2,
          transform(sequence(lit(2), size(parts)), n => call_function("substring_index", c, lit("/"), n)))
          .otherwise(array(c))
      case _ =>
        array(foldCol(col(field).cast("string")))
    }
  }

  private def sidecarPath(tablePath: String, field: String): String =
    s"$tablePath/_bloom/field=$field"

  private final case class SidecarRow(
      file: String, bits: Array[Long], numBits: Int, numHashes: Int)

  /** Driver-side sidecar cache. The sidecar is planner metadata (KBs
    * per file per field) — a serving deployment keeps it resident like
    * any other index metadata instead of paying a Spark job per query
    * to re-read it. Keyed by sidecar path; invalidated by a directory
    * signature (file count + per-file length/mtime via the Hadoop FS
    * API, so appends from [[update]] and rebuilds are picked up).
    */
  private val sidecarCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Array[SidecarRow])]()

  private def sidecarRows(spark: SparkSession, sc: String): Option[Array[SidecarRow]] = {
    val p = new org.apache.hadoop.fs.Path(sc)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sig = try {
      if (!fs.exists(p)) return None
      fs.listStatus(p).foldLeft(17L)((a, s) =>
        a * 1000003L + s.getPath.getName.hashCode.toLong * 31L +
          s.getLen * 7L + s.getModificationTime)
    } catch { case _: Exception => return None }
    val cached = sidecarCache.get(sc)
    if (cached != null && cached._1 == sig) return Some(cached._2)
    val rows = try {
      spark.read.parquet(sc)
        .select("file", "bits", "num_bits", "num_hashes").collect()
        .map(r => SidecarRow(r.getString(0), r.getSeq[Long](1).toArray,
          r.getInt(2), r.getInt(3)))
    } catch { case _: Exception => return None }
    sidecarCache.put(sc, (sig, rows))
    Some(rows)
  }

  /** One distributed pass per field: explode the field's token stream,
    * OR per-token bit positions into a per-file bitset.
    */
  /** (file, bits, num_bits, num_hashes) rows for one field of `df`. */
  private def bloomFrame(df: DataFrame, mapping: SeqMapping, field: String,
      numBits: Int, numHashes: Int): DataFrame = {
    require(numBits % 64 == 0, "numBits must be a multiple of 64")
    require(mapping.fields.contains(field), s"field '$field' not in mapping")
    val agg = new Aggregator[String, Array[Long], Array[Long]] {
      override def zero: Array[Long] = new Array[Long](numBits / 64)
      override def reduce(b: Array[Long], token: String): Array[Long] = {
        if (token != null) {
          val ps = bitPositions(UTF8String.fromString(token), numBits, numHashes)
          var i = 0
          while (i < ps.length) { b(ps(i) >>> 6) |= 1L << (ps(i) & 63); i += 1 }
        }
        b
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      }
      override def finish(r: Array[Long]): Array[Long] = r
      override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
    val bloomUdaf = udaf(agg, Encoders.STRING)
    df.select(input_file_name().as("file"),
        explode_outer(tokensCol(df, mapping, field)).as("tok"))
      .groupBy(col("file"))
      .agg(bloomUdaf(col("tok")).as("bits"))
      .select(col("file"), col("bits"),
        lit(numBits).as("num_bits"), lit(numHashes).as("num_hashes"))
  }

  def build(spark: SparkSession, tablePath: String, mapping: SeqMapping,
      fields: Seq[String], numBits: Int = DefaultNumBits,
      numHashes: Int = DefaultNumHashes): Unit = {
    val df = spark.read.parquet(tablePath)
    for (field <- fields)
      bloomFrame(df, mapping, field, numBits, numHashes)
        .write.mode("overwrite").parquet(sidecarPath(tablePath, field))
  }

  /** Incremental maintenance: index ONLY the files the sidecar hasn't
    * seen (streaming appends, compaction outputs) and append their
    * rows. Unindexed files were merely unprunable before this runs —
    * never wrong — so the update can lag ingestion arbitrarily (the
    * same active-vs-sealed split as the reference: fresh data is
    * queryable immediately, index catches up at seal time). Sidecar
    * rows for files that no longer exist (e.g. replaced by compaction)
    * dangle harmlessly: candidate selection intersects with the live
    * file list. Returns the number of newly indexed files.
    */
  def update(spark: SparkSession, tablePath: String, mapping: SeqMapping,
      fields: Seq[String], numBits: Int = DefaultNumBits,
      numHashes: Int = DefaultNumHashes): Int = {
    val all = spark.read.parquet(tablePath).inputFiles.toSet
    var newlyIndexed = Set.empty[String]
    for (field <- fields) {
      val sc = sidecarPath(tablePath, field)
      val known = try {
        spark.read.parquet(sc).select("file").collect().map(_.getString(0)).toSet
      } catch { case _: Exception => Set.empty[String] }
      val missing = (all -- known).toSeq.sorted
      if (missing.nonEmpty) {
        newlyIndexed ++= missing
        val df = spark.read.option("basePath", tablePath).parquet(missing: _*)
        bloomFrame(df, mapping, field, numBits, numHashes)
          .write.mode("append").parquet(sc)
      }
    }
    newlyIndexed.size
  }

  /** Conjunctively-required (field → tokens) of a seq-ql query: tokens
    * that every matching document MUST contain, i.e. only exact
    * (wildcard-free) `field:value` terms reachable through `and`. Any
    * `or`/`not`/range/exists/nested/tags branch contributes nothing —
    * pruning stays an over-approximation of the match set.
    */
  def requiredTokens(query: String, mapping: SeqMapping): Map[String, Seq[String]] = {
    def fold(s: String): String = if (mapping.caseSensitive) s else s.toLowerCase(java.util.Locale.ROOT)
    def walk(ast: SeqAst): Seq[(String, String)] = ast match {
      case And(l, r) => walk(l) ++ walk(r)
      case FullText(field, value) if !value.hasWildcard && mapping.fields.contains(field) &&
          !field.startsWith("_") =>
        mapping.fields(field).mainType match {
          case IndexType.Keyword =>
            Seq(field -> fold(value.exact))
          case IndexType.Text =>
            Tokenizers.tokenize(value.exact, mapping.caseSensitive).map(field -> _)
          case IndexType.Path =>
            Seq(field -> fold(value.exact))
          case _ => Seq.empty
        }
      case _ => Seq.empty
    }
    walk(SeqQlParser.parse(query).ast).groupBy(_._1).map { case (f, ts) =>
      (f, ts.map(_._2).distinct)
    }
  }

  /** Files of `tablePath` that can contain all `required` tokens:
    * sidecar-indexed files are Bloom-tested per token; files unknown to
    * the sidecar (appended since the build) and fields without a
    * sidecar never prune. Returns None when nothing can prune (read
    * the table normally).
    */
  def candidateFiles(spark: SparkSession, tablePath: String,
      required: Map[String, Seq[String]]): Option[Seq[String]] = {
    if (required.isEmpty) return None
    val allFiles = spark.read.parquet(tablePath).inputFiles.toSeq
    var indexed = Set.empty[String]   // files covered by every consulted sidecar
    var surviving = Set.empty[String] // of those, files passing every Bloom test
    var first = true
    var anySidecar = false
    for ((field, tokens) <- required) {
      val sc = sidecarPath(tablePath, field)
      for (rows <- sidecarRows(spark, sc)) {
        anySidecar = true
        val pass = rows.filter { r =>
          tokens.forall(t => maybeContains(r.bits, r.numBits, r.numHashes, t))
        }.map(_.file).toSet
        val covered = rows.map(_.file).toSet
        // a file may be pruned only when EVERY consulted sidecar has
        // examined it AND some test failed — so coverage intersects
        // (a file one sidecar never saw must stay "unknown" → kept)
        if (first) { indexed = covered; surviving = pass; first = false }
        else { indexed = indexed intersect covered; surviving = surviving intersect pass }
      }
    }
    if (!anySidecar) return None
    // keep: files passing all tests + files the sidecars never saw
    val unknown = allFiles.filterNot(indexed.contains)
    Some((allFiles.filter(surviving.contains) ++ unknown).sorted)
  }

  /** Disjunctive variant for point lookups (Fetch, S5): a batch of ids
    * is an OR, so a file survives when ANY probed token passes its
    * Bloom — the union of per-token survivor sets, plus files the
    * sidecar never saw. This is the reference's "token dict → LID list"
    * narrowing for _mget-style access: a k-id fetch over a million-file
    * table touches ≈ k files (those whose token set can contain an id)
    * instead of every file the time bounds admit. Returns None when the
    * field has no sidecar.
    */
  def candidateFilesAny(spark: SparkSession, tablePath: String,
      field: String, tokens: Seq[String]): Option[Seq[String]] = {
    if (tokens.isEmpty) return None
    val rows = sidecarRows(spark, sidecarPath(tablePath, field)) match {
      case Some(r) => r
      case None    => return None
    }
    val pass = rows.filter { r =>
      tokens.exists(t => maybeContains(r.bits, r.numBits, r.numHashes, t))
    }.map(_.file).toSet
    val covered = rows.map(_.file).toSet
    val allFiles = spark.read.parquet(tablePath).inputFiles.toSeq
    Some((allFiles.filter(pass.contains) ++ allFiles.filterNot(covered.contains)).sorted)
  }

  /** Read `tablePath` restricted to files that can contain ANY of the
    * probed tokens in `field` (see [[candidateFilesAny]]). */
  def prunedReadAny(spark: SparkSession, tablePath: String,
      field: String, tokens: Seq[String]): DataFrame =
    candidateFilesAny(spark, tablePath, field, tokens) match {
      case Some(files) if files.nonEmpty =>
        spark.read.option("basePath", tablePath).parquet(files: _*)
      case Some(_) => spark.read.parquet(tablePath).limit(0)
      case None    => spark.read.parquet(tablePath)
    }

  /** Read `tablePath` restricted to the files a query's required tokens
    * can match (partition columns preserved via basePath). Falls back
    * to the plain read when pruning cannot apply.
    */
  def prunedRead(spark: SparkSession, tablePath: String, query: String,
      mapping: SeqMapping): DataFrame =
    candidateFiles(spark, tablePath, requiredTokens(query, mapping)) match {
      case Some(files) if files.nonEmpty =>
        spark.read.option("basePath", tablePath).parquet(files: _*)
      case Some(_) =>
        // every file pruned: preserve schema with an empty frame
        spark.read.parquet(tablePath).limit(0)
      case None => spark.read.parquet(tablePath)
    }
}
