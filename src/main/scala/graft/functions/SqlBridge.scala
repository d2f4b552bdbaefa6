package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-placed bridge: Column <-> catalyst Expression conversion is
  * `private[sql]` in Spark 4 (`classic.ExpressionUtils`), so custom
  * expressions (graft.functions.CharFoldExpr) need this standard
  * extension escape hatch to be wrapped as user-facing Columns. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Unset a SparkContext's checkpoint dir (`checkpointDir` is
    * `private[spark]`; there is no public unset) — lets specs restore a
    * shared session to the localCheckpoint path after exercising the
    * reliable-checkpoint path. */
  def clearCheckpointDir(sc: org.apache.spark.SparkContext): Unit =
    sc.checkpointDir = None
}
