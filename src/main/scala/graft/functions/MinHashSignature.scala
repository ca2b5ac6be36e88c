package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: all `numHashes` minhash values of a shingle
  * array in one pass — `minhash_k = min over shingles of
  * md5(k || ":" || shingle)`, hex-encoded, bit-identical to composing
  * Spark's `md5`/`min` (and therefore to the DuckDB oracle).
  *
  * Why an expression: the composable alternative (explode each shingle,
  * 16 codegen'd md5+min aggregates) is correct but pays a shuffle for the
  * partial/final aggregation; this is a narrow map — per document, one
  * tight JVM loop hashing shingles × seeds, keeping byte-array mins and
  * hex-encoding only the 16 winners. At 100 TB that removes the only
  * shuffle in the signature stage of the dedup pipeline (banding then
  * shuffles just 4 band hashes per doc).
  *
  * CodegenFallback is deliberate: the per-row work is a multi-kilobyte
  * digest loop that JITs well as plain JVM code; nothing is gained by
  * splicing it into generated Java, and the expression sits outside the
  * hot comparison loops (unlike CosineSimilarity, which runs per PAIR).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    (0 until numHashes).map(k => s"$k:".getBytes("UTF-8")).toArray

  /** Unsigned lexicographic byte compare — the same order hex strings
    * sort in, so comparing digests avoids 16× hex encodes per shingle. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  private def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bytes(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MessageDigest.getInstance("MD5")
    val mins = Array.ofDim[Array[Byte]](numHashes)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val shingle = arr.getUTF8String(i).getBytes
        var k = 0
        while (k < numHashes) {
          md.update(seedPrefixes(k))
          md.update(shingle)
          val d = md.digest() // digest() also resets
          if (mins(k) == null || less(d, mins(k))) mins(k) = d
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(
      mins.map(m => if (m == null) null else UTF8String.fromString(hex(m))): Array[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def column(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(shingles), numHashes))
}
