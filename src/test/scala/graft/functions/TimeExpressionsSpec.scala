package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec
import graft.ingest.BulkIngest

/** Parity of the fused ingest time kernel (DocTimeExpr) against the
  * declarative reference formulation it replaced: from_json for field
  * extraction, try_to_timestamp chains for parsing.
  */
class TimeExpressionsSpec extends SparkSpec {

  private val keys = Array("timestamp", "time", "ts").map(UTF8String.fromString)
  private def extract(doc: String): String = {
    val r = TimeKernels.extractField(UTF8String.fromString(doc), keys)
    if (r == null) null else r.toString
  }
  private def fast(s: String): java.lang.Long =
    TimeKernels.parseMillis(UTF8String.fromString(s), noZoneIsUtc = true)

  test("extractField: priority, types, escapes, malformed") {
    assert(extract("""{"timestamp":"2024-01-01T00:00:00Z"}""") == "2024-01-01T00:00:00Z")
    // priority: timestamp > time > ts regardless of field order
    assert(extract("""{"ts":"a","time":"b","timestamp":"c"}""") == "c")
    assert(extract("""{"ts":"a","time":"b"}""") == "b")
    assert(extract("""{"ts":"a"}""") == "a")
    assert(extract("""{"timestamp":"c","ts":"a"}""") == "c")
    // non-time keys skipped, nested objects do not leak inner keys
    assert(extract("""{"level":"x","inner":{"timestamp":"no"},"ts":"yes"}""") == "yes")
    assert(extract("""{"arr":[{"time":"no"},1,2],"time":"yes"}""") == "yes")
    // number value → its text; null value claims the slot as absent
    assert(extract("""{"ts":1234}""") == "1234")
    assert(extract("""{"time":null,"ts":"x"}""") == null)
    // escaped content in values and keys
    assert(extract("""{"note":"say \"hi\"","ts":"2024-01-01"}""") == "2024-01-01")
    // duplicate keys: last occurrence wins (Jackson/from_json parity)
    assert(extract("""{"ts":"garbage","ts":"2024-01-01T00:00:00Z"}""") == "2024-01-01T00:00:00Z")
    assert(extract("""{"timestamp":"a","timestamp":"b"}""") == "b")
    // ...but a lower-priority dup never overrides a higher-priority key
    assert(extract("""{"timestamp":"a","ts":"x","ts":"y"}""") == "a")
    // malformed JSON → null (from_json PERMISSIVE null-row behavior)
    assert(extract("""{"ts":"x"""") == null)
    assert(extract("""not json""") == null)
    assert(extract("""{}""") == null)
    assert(extract("""{"a":}""") == null)
  }

  test("parseMillis: formats, zones, fractions, validation") {
    assert(fast("2024-03-10T11:30:00Z") == 1710070200000L)
    assert(fast("2024-03-10 11:30:00") == 1710070200000L)
    assert(fast("2024-03-10T11:32:00.123456Z") == 1710070320123L)
    assert(fast("2024-03-10T11:30:00+02:00") == 1710070200000L - 7200000L)
    assert(fast("2024-03-10T11:30:00-0330") == 1710070200000L + 12600000L)
    assert(fast("  2024-03-10T11:30:00Z  ") == 1710070200000L)
    assert(fast("1970-01-01T00:00:00Z") == 0L)
    assert(fast("1969-12-31T23:59:59.5Z") == -500L)
    // truncated zone offsets must return null, never index out of range
    assert(fast("2024-01-01T00:00:00+") == null)
    assert(fast("2024-01-01T00:00:00+0") == null)
    assert(fast("2024-01-01T00:00:00+05:") == null)
    assert(fast("2024-01-01T00:00:00+05:3") == null)
    assert(fast("2024-01-01T00:00:00-1") == null)
    // lowercase separators are NOT decided here (strict patterns; the
    // general parser owns them)
    assert(fast("2024-03-10t11:30:00Z") == null)
    assert(fast("2024-03-10T11:30:00z") == null)
    // rejected → null (fall back to the general parser)
    assert(fast("2024-13-01T00:00:00Z") == null)
    assert(fast("2024-02-30T00:00:00Z") == null)
    assert(fast("2024-03-10T24:00:00Z") == null)
    assert(fast("2024-03-10T11:30:60Z") == null)
    assert(fast("2024-03-10T11:30:00+19:00") == null)
    assert(fast("2024-03-10T11:30:00Zx") == null)
    assert(fast("10/03/2024 11:30") == null)
    assert(fast("") == null)
    // leap day valid
    assert(fast("2024-02-29T00:00:00Z") != null)
    assert(fast("1900-02-29T00:00:00Z") == null)
    assert(fast("2000-02-29T00:00:00Z") != null)
  }

  test("kernel parity vs from_json + try_to_timestamp on generated docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val times = Seq(
      "2024-03-10T11:30:00Z", "2024-03-10 11:30:00", "2024-03-10T11:30:00.123Z",
      "2024-03-10T11:30:00.123456789+05:30", "2023-12-31 23:59:59.9",
      "garbage", "2024-99-99T00:00:00Z", "", "1999-01-01T01:02:03-08:00")
    val docs = (1 to 400).map { i =>
      val parts = scala.collection.mutable.ArrayBuffer[String]()
      if (rnd.nextBoolean()) parts += s""""level":"l${rnd.nextInt(5)}""""
      if (rnd.nextBoolean()) parts += s""""nested":{"ts":"2001-01-01T00:00:00Z","n":${rnd.nextInt(100)}}"""
      for (k <- Seq("timestamp", "time", "ts") if rnd.nextInt(3) == 0) {
        parts += s""""$k":"${times(rnd.nextInt(times.length))}""""
        // occasional duplicate key — both engines must agree last-wins
        if (rnd.nextInt(4) == 0)
          parts += s""""$k":"${times(rnd.nextInt(times.length))}""""
      }
      if (rnd.nextBoolean()) parts += s""""msg":"m \\"q\\" ${rnd.nextInt(10)}""""
      s"{${rnd.shuffle(parts).mkString(",")}}"
    } :+ """{"ts":1710070200}""" :+ """{"time":null}""" :+ "broken{"
    val df = docs.toDF("value")

    val fused = BulkIngest.stamp(df, requestTimeMs = 1710072000000L,
      allowedDriftMs = Long.MaxValue / 4, futureDriftMs = Long.MaxValue / 4)
      .select("mid").as[Long].collect().toSeq

    // reference formulation (the pre-kernel stamp)
    val timeSchema = StructType(BulkIngest.TimeFields.map(f => StructField(f, StringType)))
    val withTimes = df
      .where(BulkIngest.stripActionLines(df, "value"))
      .withColumn("__times", from_json(col("value"), timeSchema))
    val probed = coalesce(BulkIngest.TimeFields.map(f => col("__times").getField(f)): _*)
    val slow = unix_millis(coalesce(
      call_function("try_to_timestamp", probed,
        lit("yyyy-MM-dd'T'HH:mm:ss[.SSSSSSSSS][.SSSSSS][.SSS][XXX][X]")),
      call_function("try_to_timestamp", probed,
        lit("yyyy-MM-dd HH:mm:ss[.SSSSSSSSS][.SSSSSS][.SSS][XXX][X]")),
      call_function("try_to_timestamp", probed)))
    val expected = withTimes.select(coalesce(slow, lit(1710072000000L)).as("mid"))
      .as[Long].collect().toSeq

    assert(fused == expected)
  }
}
