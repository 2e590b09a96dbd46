package graft.dataprep

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization: range, zero vectors, exact reconstruction bound") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),   // zero vector → zeros, scale 0
      (3L, Array(2.0f, 2.0f, -2.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val rows = Similarity.quantizeInt8(df, "vec_id", "embedding").collect()
    val byId = rows.groupBy(_.getLong(0))
    // q always in [-127, 127]; extremes hit exactly
    assert(rows.forall(r => math.abs(r.getLong(2)) <= 127))
    assert(byId(1L).map(_.getLong(2)).toSeq == Seq(64, -127, 32, 0))
    assert(byId(2L).forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L))
    assert(byId(3L).map(_.getLong(2)).toSeq == Seq(127, 127, -127, 64))
    // dequantized error bounded by scale/2 = amax/254
    val amax1 = 1.0
    val deq = byId(1L).map(r => r.getLong(2) * amax1 / 127.0)
    val orig = Seq(0.5, -1.0, 0.25, 0.0)
    deq.zip(orig).foreach { case (d, o) => assert(math.abs(d - o) <= amax1 / 254.0 + 1e-12) }
  }

  test("int8TopK ranks by quantized dot with id tie-break and excludes self") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),   // identical to query → top
      (2L, Array(0.5f, 0.5f)),
      (3L, Array(-1.0f, 0.0f)),  // anti-parallel → last
    ).toDF("vec_id", "embedding")
    val out = Similarity.int8TopK(df, "vec_id", "embedding", Seq(0L), k = 3).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall(_.getLong(0) == 0L))
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L)) // ranks
  }
}
