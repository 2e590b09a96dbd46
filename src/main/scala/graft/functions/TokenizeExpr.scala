package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Precompiled tokenizer kernel: maximal runs of Unicode
  * letters/digits/`_`/`*` (the text tokenizer's char class —
  * equivalent to the `[^a-z0-9_*\p{L}\p{N}]+` split regex, but a
  * codepoint loop instead of a Java regex with Unicode property
  * classes, which costs ~1 µs/char and dominated cold tokenization).
  */
object TokenKernels {
  def isTokenChar(cp: Int): Boolean =
    Character.isLetter(cp) || Character.isDigit(cp) || cp == '_' || cp == '*'

  def tokenize(input: UTF8String, lowerCase: Boolean): ArrayData = {
    val s0 = input.toString
    val s = if (lowerCase) s0.toLowerCase else s0
    val out = new java.util.ArrayList[AnyRef](16)
    val n = s.length
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (isTokenChar(cp)) {
        val start = i
        var j = i
        while (j < n && isTokenChar(s.codePointAt(j))) j += Character.charCount(s.codePointAt(j))
        out.add(UTF8String.fromString(s.substring(start, j)))
        i = j
      } else {
        i += Character.charCount(cp)
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Sorted distinct xxhash64 (seed 42 — Spark's xxhash64 function) of
  * word-bigram shingles, fused into one kernel: replaces
  * sort(distinct(hash(transform(concat(try_element_at...))))) — no
  * intermediate arrays or HOF lambda frames per row.
  * Bigram text = tokens(i) + " " + tokens(i+1), identical to
  * [[graft.dataprep.TextPrep.bigramShingles]].
  */
object ShingleKernels {
  private val SPACE = UTF8String.fromString(" ")

  def bigramHashes(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](n - 1)
    var i = 0
    while (i < n - 1) {
      val big = UTF8String.concat(tokens.getUTF8String(i), SPACE, tokens.getUTF8String(i + 1))
      hs(i) = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        big, org.apache.spark.sql.types.StringType, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    // dedupe in place
    var w = 1
    var r = 1
    while (r < hs.length) {
      if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }
}

case class BigramHashesExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleKernels.bigramHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ShingleKernels.bigramHashes($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column expression wrapping [[TokenKernels.tokenize]]; generated code
  * is a single static call, so whole-stage codegen stays small.
  */
case class TokenizeExpr(child: Expression, lowerCase: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenKernels.tokenize(input.asInstanceOf[UTF8String], lowerCase)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.TokenKernels.tokenize($x, $lowerCase);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Wire-format id string `hex(LE mid)-hex(LE rid)` (seq/seq.go:37-53)
  * as a column expression, for responses that carry document ids.
  */
case class SeqIdStringExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(mid: Any, rid: Any): Any =
    UTF8String.fromString(
      graft.model.SeqId(mid.asInstanceOf[Long], rid.asInstanceOf[Long]).toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (m, r) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  new graft.model.SeqId($m, $r).toString());""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object TokenizeExpr {
  def tokens(text: Column, caseSensitive: Boolean): Column =
    ColumnBridge.column(TokenizeExpr(ColumnBridge.expression(text), lowerCase = !caseSensitive))

  def bigramHashes(tokens: Column): Column =
    ColumnBridge.column(BigramHashesExpr(ColumnBridge.expression(tokens)))
}
