package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Native Catalyst expression: probe a serialized Count-Min sketch for a
  * long key's estimated frequency.
  *
  * Spark ships the sketch BUILDER as an aggregate (`count_min_sketch`,
  * `CountMinSketchAgg`) but no probe side — the sketch comes back as an
  * opaque `binary` you can only deserialize driver-side. This expression
  * closes the loop distributively: the sketch travels as a (fixed-size)
  * literal into the probe plan, each task deserializes it ONCE (identity-
  * cached — a literal's byte array is one object per task), and every key
  * probe is then array arithmetic, inside whole-stage codegen via a
  * reference object.
  *
  * The estimate is `CountMinSketch.estimateCount`, which NEVER
  * underestimates (CMS guarantees est >= true count) — the property
  * [[graft.operators.Relational]]'s heavy-hitters entry (q58) relies on
  * for an exactly-checkable result: CMS-filtered candidates verified by
  * exact counting lose no true heavy key.
  *
  * The reference has no sketch surface (SURVEY.md §2.3 — its aggregates
  * stop at Sum/Count/MinMax/Avg); this is pipeline-engine green-field
  * work alongside q41's HLL and q46's sketch merge.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType, LongType)

  override def dataType: DataType = LongType

  override def prettyName: String = "cms_estimate"

  // Per-task deserialization cache. The sketch argument is in practice a
  // literal (one byte-array object per task after serialization), so an
  // identity check makes every probe after the first a pure array read.
  // Falls back to re-deserializing if a non-literal sketch column ever
  // feeds this (correct, just slower).
  //
  // The (bytes, sketch) pairing lives in ONE immutable tuple behind a
  // single volatile field: two separately-mutated vars could tear if an
  // expression instance were ever shared across threads with two distinct
  // sketches (bytesX paired with sketchY → silently wrong estimates).
  // Per-task plan deserialization makes sharing unlikely, but nothing
  // enforces it — the single-reference publish makes tearing impossible
  // either way (worst case under a race: a redundant re-deserialize).
  @volatile @transient private[this] var cached: (Array[Byte], CountMinSketch) = _

  def estimate(bytes: Array[Byte], key: Long): Long = {
    var c = cached
    if (c == null || !(bytes eq c._1)) {
      c = (bytes, CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes)))
      cached = c
    }
    c._2.estimateCount(java.lang.Long.valueOf(key))
  }

  override def nullSafeEval(sk: Any, key: Any): Any =
    estimate(sk.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimate", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, (sk, key) => s"${ev.value} = $ref.estimate($sk, $key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  /** DataFrame-API handle: `cmsEstimate(lit(sketchBytes), $"key")`. */
  def column(sketch: Column, key: Column): Column =
    GraftBridge.column(
      CmsEstimate(GraftBridge.expression(sketch), GraftBridge.expression(key)))
}
