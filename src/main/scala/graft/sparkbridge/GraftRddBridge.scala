package org.apache.spark.rdd

/** Bridge to the rdd-private checkpoint predicate: graft.Caches'
  * storage sweep must free ONLY locally-checkpointed RDD blocks (never a
  * cached frame's column buffers), and `RDD.isLocallyCheckpointed` is
  * `private[rdd]`. Same pattern as GraftExpressionBridge — keep it to
  * this one-liner. */
object GraftRddBridge {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}
