package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave, bit by bit. */
  private def mortonRef(a: Int, b: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((a >> i) & 1).toLong << (2 * i) | ((b >> i) & 1).toLong << (2 * i + 1)
    }

  test("morton2 matches the bit-by-bit reference on known and random points") {
    val pts = Seq((0, 0), (1, 0), (0, 1), (1, 1), (0xFFFF, 0xFFFF), (0xABCD, 0x1234)) ++
      (1 to 50).map(i => (i * 1103515245 & 0xFFFF, i * 12345 & 0xFFFF))
    val got = pts.toDF("a", "b")
      .select(ZOrder.morton2(col("a").cast("long"), col("b").cast("long")))
      .as[Long].collect()
    assert(got.toSeq == pts.map { case (a, b) => mortonRef(a, b) })
  }

  test("quantize16 maps range endpoints to cell bounds, stays within [0, 65535]") {
    val lo = -1000000L; val hi = 3000000L
    val vs = Seq(lo, hi, 0L, lo + 1, hi - 1, 1234567L)
    val cells = vs.toDF("v")
      .select(ZOrder.quantize16(col("v"), lo, hi)).as[Long].collect().toSeq
    assert(cells.head == 0L && cells(1) == 65535L)
    assert(cells.forall(c => c >= 0 && c <= 65535))
    // full-range long axis must not overflow
    val wide = Seq(Long.MinValue, 0L, Long.MaxValue).toDF("v")
      .select(ZOrder.quantize16(col("v"), Long.MinValue, Long.MaxValue))
      .as[Long].collect().toSeq
    // midpoint: 65535 * 2^63 / (2^64 - 1) = 32767.500…02 → half-up 32768
    assert(wide == Seq(0L, 32768L, 65535L))
  }

  test("z-clustered write + zone map: pruned needle equals full scan, and prunes files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val n = 4096
    val df = spark.range(n.toLong).select(
      (col("id") * 2654435761L % n).as("user"),   // decorrelate the axes
      (col("id") * 40503L % n).as("t"),
      col("id").as("payload"))
    // 16 output files so a needle has something to skip
    ZOrder.writeClustered(df, "user", "t", s"$dir/tbl", numFiles = Some(16))

    val bounds = Map[String, (Option[Long], Option[Long])](
      "user" -> ((Some(0L), Some(200L))),
      "t"    -> ((Some(0L), Some(800L))))
    val all = spark.read.parquet(s"$dir/tbl")
    val cand = ZoneMapIndex.candidateFiles(spark, s"$dir/tbl", bounds)
    assert(cand.isDefined, "sidecar must prune")
    assert(cand.get.size < all.inputFiles.length,
      s"needle should skip files: ${cand.get.size} of ${all.inputFiles.length}")

    val pred = col("user").between(0, 200) && col("t").between(0, 800)
    val got = ZoneMapIndex.prunedRead(spark, s"$dir/tbl", bounds)
      .where(pred).select("payload").as[Long].collect().sorted.toSeq
    val exp = all.where(pred).select("payload").as[Long].collect().sorted.toSeq
    assert(got == exp && got.nonEmpty)
  }

  test("zone map never prunes files it has not seen; update() indexes only them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zonemap").toString
    spark.range(100).select(col("id").as("k")).coalesce(1)
      .write.parquet(s"$dir/tbl")
    ZoneMapIndex.build(spark, s"$dir/tbl", Seq("k"))
    // append rows far outside the indexed range, unseen by the sidecar
    spark.range(100).select((col("id") + 1000000L).as("k")).coalesce(1)
      .write.mode("append").parquet(s"$dir/tbl")
    val bounds = Map[String, (Option[Long], Option[Long])](
      "k" -> ((Some(1000050L), Some(1000050L))))
    val got = ZoneMapIndex.prunedRead(spark, s"$dir/tbl", bounds)
      .where(col("k") === 1000050L).count()
    assert(got == 1L, "unindexed appended file must never be pruned")
    // incremental update indexes exactly the one new file, after which
    // the old-range probe skips it
    assert(ZoneMapIndex.update(spark, s"$dir/tbl", Seq("k")) == 1)
    assert(ZoneMapIndex.update(spark, s"$dir/tbl", Seq("k")) == 0)
    val lowProbe = Map[String, (Option[Long], Option[Long])](
      "k" -> ((Some(10L), Some(20L))))
    val candLow = ZoneMapIndex.candidateFiles(spark, s"$dir/tbl", lowProbe)
    assert(candLow.get.size == 1, "post-update, low probe touches only the low file")
  }

  test("all-null zone interval never matches a bounded probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zonenull").toString
    Seq[Option[Long]](None, None).toDF("k").coalesce(1).write.parquet(s"$dir/tbl")
    Seq[Option[Long]](Some(5L)).toDF("k").coalesce(1).write.mode("append").parquet(s"$dir/tbl")
    ZoneMapIndex.build(spark, s"$dir/tbl", Seq("k"))
    val bounds = Map[String, (Option[Long], Option[Long])](
      "k" -> ((Some(0L), Some(10L))))
    val cand = ZoneMapIndex.candidateFiles(spark, s"$dir/tbl", bounds)
    assert(cand.get.size == 1, "the all-null file is skipped, the value file kept")
  }
}
