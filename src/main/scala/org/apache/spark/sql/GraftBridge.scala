package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column ⇄ Expression converters —
  * the supported way for a library to lift a custom Catalyst `Expression`
  * into the public `Column` API in Spark 4.x (where `new Column(expr)` is
  * gone and columns wrap `ColumnNode`s).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGERLY converted Catalyst expression of a Column. `expression`
    * returns a lazy `ColumnNodeExpression` wrapper for `expr("...")`
    * columns (the SQL text unparsed inside a `SqlExpression` node), which
    * makes any tree introspection — collecting referenced attribute
    * names, splitting AND-conjuncts — silently see an opaque leaf. This
    * runs the classic converter (parsing SQL expression nodes) so the
    * returned tree is the real parsed/constructed expression. */
  def parsedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Lift a logical plan into a DataFrame (`Dataset.ofRows` is
    * `private[sql]` in 4.x) — used by the optimizer's selectivity probe. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Run `f` with `s` ACTIVE on the current thread (restoring the prior
    * active session after) — `SparkSession.withActive` is
    * `private[sql]`. Needed because the active session is an
    * inheritable THREAD-local: a server/pool thread that never
    * inherited one gets `SQLConf.get` DEFAULTS for driver-side plan
    * work outside an execution scope — e.g. `plan.stats` silently
    * switches from the CBO visitor to the size-only visitor, flipping
    * size estimates ~2× (r13, measured 16000 vs 32000 for one plan).
    * Executions are safe (Spark brackets them); this brackets the
    * plan-time stats reads graft's admission and zip-strategy decisions
    * make directly. */
  def withActive[T](s: SparkSession)(f: => T): T =
    s.asInstanceOf[classic.SparkSession].withActive(f)

  /** The columnar-buffer RDD id behind a persisted frame, when the
    * CacheManager holds it AND its buffers have materialized — the handle
    * for block-manager-measured segment sizes (`CacheManager` and
    * `CachedData` are `private[sql]`). None for unpersisted frames and
    * for registered-but-never-executed ones. */
  def cachedBufferRddId(df: DataFrame): Option[Int] = {
    val cls = df.sparkSession.asInstanceOf[classic.SparkSession]
    cls.sharedState.cacheManager
      .lookupCachedData(df.asInstanceOf[classic.Dataset[_]])
      .map(_.cachedRepresentation.cacheBuilder)
      .filter(_.isCachedColumnBuffersLoaded)
      .map(_.cachedColumnBuffers.id)
  }
}
