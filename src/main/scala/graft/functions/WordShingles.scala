package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-k-gram shingling: space-joined k-grams of a word array,
  * empty when fewer than k words. `unique = true` (the dedup default)
  * keeps distinct shingles in first-occurrence order; `unique = false`
  * emits all n−k+1 in position order (the repetition-measurement shape,
  * where the multiplicity IS the signal).
  *
  * Replaces `array_distinct(transform(sequence(...), i -> concat_ws(...)))`
  * — semantically identical, but that composition runs interpreted (HOF
  * lambdas aren't codegen'd and each element re-walks the lambda
  * machinery), measured at ~1.7 ms per 50-word document; this is one fused
  * loop with a hash set, ~30× faster, and it sits at the head of every
  * dedup/fingerprint pipeline.
  */
case class WordShingles(child: Expression, k: Int, unique: Boolean = true)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(k >= 1, "shingle width must be >= 1")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "word_shingles"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen: java.util.Collection[UTF8String] =
      if (unique) new java.util.LinkedHashSet[UTF8String](n * 2)
      else new java.util.ArrayList[UTF8String](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val parts = Array.ofDim[UTF8String](k)
      var j = 0
      while (j < k) {
        // normalize a NULL word to the empty string EXPLICITLY: without
        // the check the value is representation-dependent (UnsafeArrayData
        // decodes a null slot as "", GenericArrayData yields null which
        // concatWs SKIPS) — the same logical row would fingerprint
        // differently depending on which physical plan produced the array
        parts(j) =
          if (words.isNullAt(i + j)) UTF8String.EMPTY_UTF8
          else words.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    val out = Array.ofDim[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def column(words: Column, k: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(words), k))

  /** All positional k-grams (duplicates kept). */
  def columnAll(words: Column, k: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(words), k, unique = false))
}
