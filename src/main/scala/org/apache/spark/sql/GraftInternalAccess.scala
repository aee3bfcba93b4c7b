package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway this library uses: wrap a custom logical
  * plan in a DataFrame. Spark exposes no public constructor for "DataFrame
  * over my own LogicalPlan node" — extension libraries carry exactly this
  * shim. Kept to a single method in
  * a single file so the internal surface area is auditable at a glance.
  */
object GraftInternalAccess {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
