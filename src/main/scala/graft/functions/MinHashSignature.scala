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
  * array in one pass — ONE md5 per shingle, with the k-th hash stream
  * derived by rotating the 32-char hex digest left by k characters:
  * `minhash_k = min over shingles of rot_k(md5(shingle))`. Rotation k
  * orders shingles by the digest nibbles starting at position k, and md5
  * nibbles at different positions are independent, so the 16 streams
  * behave as 16 hash functions at 1/16th the digest cost (the digest
  * loop, not the comparison, dominated the profile when each seed paid
  * its own md5). Bit-identical to the DuckDB oracle's
  * `substr(md5(x), k+1) || substr(md5(x), 1, k)`.
  *
  * Why an expression: the composable alternative (explode each shingle,
  * 16 codegen'd md5+min aggregates) is correct but pays a shuffle for the
  * partial/final aggregation; this is a narrow map — per document, one
  * tight JVM loop hashing each shingle once, keeping winning digests and
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
  require(numHashes > 0 && numHashes <= 32,
    s"numHashes=$numHashes: an md5 digest has 32 hex chars, so only 32 distinct rotations")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "minhash_sig"

  /** Nibble i (0..31) of the digest = hex char i of its hex encoding. */
  @inline private def nibble(a: Array[Byte], i: Int): Int = {
    val b = a(i >> 1) & 0xff
    if ((i & 1) == 0) b >> 4 else b & 0xf
  }

  /** a < b under the ordering of hex digests rotated left by k chars. */
  private def rotLess(a: Array[Byte], b: Array[Byte], k: Int): Boolean = {
    var j = 0
    while (j < 32) {
      val p = (k + j) & 31
      val x = nibble(a, p); val y = nibble(b, p)
      if (x != y) return x < y
      j += 1
    }
    false
  }

  /** Hex encoding of the digest rotated left by k chars. */
  private def rotHex(m: Array[Byte], k: Int): String = {
    val sb = new java.lang.StringBuilder(32)
    var j = 0
    while (j < 32) {
      sb.append(Character.forDigit(nibble(m, (k + j) & 31), 16))
      j += 1
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
        val d = md.digest(arr.getUTF8String(i).getBytes) // one md5 per shingle
        var k = 0
        while (k < numHashes) {
          if (mins(k) == null || rotLess(d, mins(k), k)) mins(k) = d
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.zipWithIndex.map { case (m, k) =>
      if (m == null) null else UTF8String.fromString(rotHex(m, k))
    }: Array[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def column(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(shingles), numHashes))
}
