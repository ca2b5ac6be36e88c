package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash over the classic pairwise-independent LCG family:
  * each shingle is keyed ONCE by the first 48 bits of its md5 digest, and
  * stream k orders shingles by `h_k(v) = (a_k·v + b_k) mod 2^48` —
  * `minhash_k = min over shingles of h_k(v(shingle))`. One digest per
  * shingle (the cost win), and the streams are genuinely independent-ish
  * hash functions (the textbook `(a·x+b) mod m` construction), unlike
  * deriving streams from rotations of one digest, whose orderings are
  * positively correlated through digests with globally small nibbles.
  *
  * 48-bit keyspace: two distinct shingles collide with p ≈ 2⁻⁴⁸ per
  * pair; a collision between doc A's and doc B's shingle sets (the only
  * kind that biases a pair's estimated similarity) has probability
  * |A||B|/2⁴⁸ ≈ 10⁻¹⁰ for 200-shingle documents. Multipliers stay below
  * 2¹⁴ so `v·a + b < 2⁶³` holds in both engines (DuckDB BIGINT errors on
  * overflow rather than wrapping).
  *
  * Shuffle-free narrow map; CodegenFallback for the same reason as
  * MinHashSignature (the digest loop dominates and JITs well). Bit-
  * identical to the DuckDB oracle built from the same constant tables.
  */
case class MinHashLcg(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(numHashes > 0 && numHashes <= MinHashLcg.A.length,
    s"numHashes=$numHashes exceeds the constant table (${MinHashLcg.A.length})")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "minhash_lcg"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MessageDigest.getInstance("MD5")
    val mins = Array.fill(numHashes)(-1L) // -1 = "no shingle seen"
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = md.digest(arr.getUTF8String(i).getBytes)
        val v = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
          ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
          ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
        var k = 0
        while (k < numHashes) {
          val h = (v * MinHashLcg.A(k) + MinHashLcg.B(k)) & MinHashLcg.Mask48
          if (mins(k) < 0 || h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m < 0) null else java.lang.Long.valueOf(m)): Array[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashLcg =
    copy(child = newChild)
}

object MinHashLcg {
  val Mask48: Long = (1L << 48) - 1
  val Mod48: Long = 1L << 48

  /** Odd multipliers < 2^14 (primes) — one per stream. */
  val A: Array[Long] = Array(
    12289L, 13331L, 15373L, 14341L, 9973L, 11351L, 12979L, 15073L,
    10007L, 11863L, 13187L, 14723L, 9283L, 10957L, 12203L, 16141L)

  /** Additive constants < 2^48 (primes scaled) — one per stream. */
  val B: Array[Long] = Array(
    8000000011L, 24000000033L, 40000000115L, 56000000001L,
    72000000061L, 88000000141L, 104000000009L, 120000000053L,
    136000000091L, 152000000037L, 168000000079L, 184000000009L,
    200000000041L, 216000000023L, 232000000055L, 248000000003L)

  def column(shingles: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashLcg(GraftBridge.expression(shingles), numHashes))

  /** DuckDB twin of the 48-bit md5 key: strpos arithmetic over the first
    * 12 hex chars (DuckDB has no conv()). `x` is the lambda variable. */
  def duckKey(x: String): String =
    (1 to 12).map { c =>
      val scale = 1L << (4 * (12 - c))
      s"(strpos('0123456789abcdef', substr(md5($x), $c, 1)) - 1) * ${scale}"
    }.mkString("(", " + ", ")")

  /** DuckDB twin of stream k applied to a key expression `v`. */
  def duckStream(k: Int, v: String): String =
    s"($v * ${A(k)} + ${B(k)}) % $Mod48"
}
