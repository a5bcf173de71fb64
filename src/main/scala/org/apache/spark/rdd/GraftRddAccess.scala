package org.apache.spark.rdd

/** Package-private RDD introspection the engine needs (the
  * `org.apache.spark.sql.graft` bridge convention, one package up):
  * [[RDD.isLocallyCheckpointed]] is `private[rdd]`, and
  * `graft.Checkpoints.sweep` must distinguish local-checkpoint block sets
  * (graft iterative-loop debris, safe to drop between queries) from
  * deliberate `persist` caches (not ours to drop).
  */
object GraftRddAccess {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}
