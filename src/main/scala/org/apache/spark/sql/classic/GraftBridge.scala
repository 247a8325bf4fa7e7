package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge to build a DataFrame from a custom LogicalPlan
  * (Dataset.ofRows is private[sql]).
  */
object GraftBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  /** Does an expected-input AbstractDataType (private[sql] hierarchy)
    * admit a TIMESTAMP/DATE argument? Used by the ns-carrier bridge to
    * decide which argument positions of an ImplicitCastInputTypes
    * expression should receive the ns→µs conversion. */
  def acceptsTimestamp(adt: org.apache.spark.sql.types.AbstractDataType): Boolean =
    (adt.acceptsType(org.apache.spark.sql.types.TimestampType) ||
      adt.acceptsType(org.apache.spark.sql.types.DateType)) &&
      // a position that takes LONG as-is (AnyDataType, numeric unions)
      // needs no bridge — the carrier is already the right type there
      !adt.acceptsType(org.apache.spark.sql.types.LongType)

  /** Expected input types of an ImplicitCastInputTypes expression as a
    * per-position accepts-timestamp mask (the AbstractDataType values
    * themselves are private[sql]). */
  def timestampInputMask(e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[Boolean] =
    e match {
      case i: org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes =>
        i.inputTypes.map(acceptsTimestamp)
      case _ => Nil
    }
}
