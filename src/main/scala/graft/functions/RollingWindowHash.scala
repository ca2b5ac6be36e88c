package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Rolling (Rabin–Karp) hash of every stride-1 window of `k` consecutive
  * tokens: for a token array of length n, returns the n−k+1 window hashes
  * in position order (empty array when n < k). Two windows with equal
  * token content always hash equal, so the result is a content-equality
  * discriminator for substring-level dedup (d20) at EVERY alignment —
  * where the fixed-boundary chunking (d13) only sees offsets 0, k, 2k, …
  *
  * Cost model — the reason this is a native expression and not
  * `transform(sequence(...), i -> md5(slice(...)))`: the composed form
  * re-concatenates and re-digests k tokens per position, O(n·k) bytes
  * hashed per document; here each token is md5'd ONCE (h_w = big-endian
  * first 8 digest bytes, the SimHash prefix convention) and consecutive
  * windows roll in O(1):
  *
  *   H(i) = Σ_{j<k} h_{w[i+j]} · B^(k−1−j)   (mod 2^64, natural wrap)
  *   H(i+1) = (H(i) − h_{w[i]}·B^(k−1)) · B + h_{w[i+k]}
  *
  * with B an odd 64-bit multiplier, so the whole stride-1 window family
  * costs the same as hashing the corpus once. At 100 TB the ×k digest
  * blow-up is the difference between "part of the scan" and a dedicated
  * CPU pass. 64-bit width means unequal windows collide with probability
  * ~2⁻⁶⁴ per pair — fine for a per-corpus discriminator at test scale and
  * pinned against a full-md5 formulation in the spec; a 100 TB corpus
  * (~10¹³ windows) would pair it with a 128-bit roll or a verify join,
  * the d16 discipline.
  *
  * Null tokens hash as the empty string (split() never produces them;
  * totality keeps the expression safe on arbitrary arrays). A null array
  * returns null (UnaryExpression null-intolerance).
  *
  * CodegenFallback for the same reason as [[SimHash]]/MinHashSignature:
  * the per-token md5 loop dominates and JITs well.
  */
case class RollingWindowHash(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(k >= 1, s"k=$k: window must have at least one token")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"rolling_window_hash_$k"

  private val B = 0x100000001b3L // odd (FNV-1a prime), invertible mod 2^64
  private val Bk1 = { // B^(k-1) mod 2^64, for the O(1) roll-off
    var p = 1L; var i = 1; while (i < k) { p *= B; i += 1 }; p
  }
  private val EmptyHash = {
    val d = MessageDigest.getInstance("MD5").digest(Array.emptyByteArray)
    var v = 0L; var b = 0
    while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
    v
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val md = MessageDigest.getInstance("MD5")
    // one digest per token, reused by every window containing it
    val hw = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) hw(i) = EmptyHash
      else {
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var v = 0L; var b = 0
        while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
        hw(i) = v
      }
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + hw(i); i += 1 }
    out(0) = h
    i = 1
    while (i <= n - k) {
      h = (h - hw(i - 1) * Bk1) * B + hw(i + k - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingWindowHash =
    copy(child = newChild)
}

object RollingWindowHash {
  def column(tokens: Column, k: Int): Column =
    GraftBridge.column(RollingWindowHash(GraftBridge.expression(tokens), k))
}
