package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native min-over-md5 signature: `minhash_k = min over shingles of
  * rot_k(md5(shingle))`, where rot_k rotates the 32-char hex digest left
  * by k characters — ONE md5 per shingle, shuffle-free narrow map.
  *
  * Stream 0 is the plain `min(md5(shingle))` — the winnowing-style
  * document fingerprint (t04's production use, where this expression
  * replaces an explode + min aggregate). Streams k > 0 give CHEAP
  * additional orderings, but they are NOT independent hash functions:
  * rotations of one digest are positively correlated through digests
  * with globally small nibbles, so multi-stream LSH banding should use
  * [[MinHashLcg]] (the pairwise-independent `(a·x+b) mod 2^48` family) —
  * the dedup pipeline does. Bit-identical to the DuckDB formulation
  * `substr(md5(x), k+1) || substr(md5(x), 1, k)`.
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
