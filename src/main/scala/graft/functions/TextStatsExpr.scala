package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass repetition counters over a token array — the fused kernel
  * behind [[graft.dataprep.TextAnalysis.repetitionStats]].
  *
  * The declarative form this replaces computed `top_word_n` as
  * array_max(transform(array_distinct(toks), w -> size(filter(toks,
  * t -> t === w)))) — O(distinct × tokens) interpreted-lambda
  * evaluations per document (HOF lambdas do not codegen), plus two
  * more array_distinct passes for the word/bigram duplicate counts.
  * This kernel produces the same five integer counts in one O(tokens)
  * pass over the array with two hash tables (a word-frequency map and
  * a bigram-pair set), inside whole-stage codegen. The counts are
  * exact (hash tables compare full UTF8String bytes — no
  * hash-collision approximation), so every downstream fraction is the
  * same IEEE division of the same integers and the relation is
  * bit-identical to the declarative form (PipelineOpsSpec pins the
  * values; the DuckDB oracle re-derives them independently).
  */
object TextStatsKernels {
  /** (n_words, n_distinct, top_word_n, n_bigrams, dup_bigram_n) — all
    * longs; bigrams are adjacent token pairs with multiplicity,
    * matching size(toks) - 1 (0 when fewer than 2 tokens).
    */
  def repetitionCounts(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    val freq = new java.util.HashMap[UTF8String, Integer](math.max(16, n * 2))
    var top = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val c = freq.merge(t, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      if (c > top) top = c.intValue()
      i += 1
    }
    val nDistinct = freq.size()
    val nBi = math.max(n - 1, 0)
    var distinctBi = 0
    if (n >= 2) {
      val biSet = new java.util.HashSet[java.util.AbstractMap.SimpleEntry[UTF8String, UTF8String]](nBi * 2)
      var j = 0
      while (j < n - 1) {
        if (biSet.add(new java.util.AbstractMap.SimpleEntry(
            toks.getUTF8String(j), toks.getUTF8String(j + 1)))) distinctBi += 1
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](
      n.toLong, nDistinct.toLong, top.toLong, nBi.toLong,
      (nBi - distinctBi).toLong))
  }
}

/** struct(n_words, n_distinct, top_word_n, n_bigrams, dup_bigram_n)
  * over an `array<string>` token column — one static kernel call, so
  * whole-stage codegen stays small (the [[TokenizeExpr]] idiom).
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_stats needs array<string>, got $other")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("dup_bigram_n", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    TextStatsKernels.repetitionCounts(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TextStatsKernels.repetitionCounts($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
