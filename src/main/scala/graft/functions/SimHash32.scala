package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 32-bit SimHash over a token array: per token, the unsigned value
  * of the first 4 md5 digest bytes (= the first 8 hex chars, what the
  * composed formulation reads via `conv(substring(md5(w), 1, 8), 16, 10)`);
  * per bit, a frequency-weighted ±1 vote; set bit j iff the vote is
  * positive. Bit-identical to the explode + 32-aggregate `groupBy(doc_id)`
  * formulation (and the DuckDB oracle), but a NARROW MAP: one fused loop
  * per document, no (doc_id, word-hash) shuffle at all — at 100 TB the
  * fingerprint stage becomes part of the scan, like MinHashSignature.
  *
  * CodegenFallback for the same reason as MinHashSignature: the md5 loop
  * dominates and JITs well; nothing is gained by splicing it into
  * generated Java.
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MessageDigest.getInstance("MD5")
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = md.digest(arr.getUTF8String(i).getBytes)
        val v = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
          ((d(2) & 0xff) << 8) | (d(3) & 0xff)
        var j = 0
        while (j < 32) {
          if (((v >>> j) & 1) == 1) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  def column(tokens: Column): Column =
    GraftBridge.column(SimHash32(GraftBridge.expression(tokens)))
}
