package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for operator-local persisted intermediates (LSH signature
  * tables, shingle sets, …) that feed multiple branches of ONE query plan.
  *
  * Operators route their `.cache()` through [[cached]]; the harness
  * (Verify / Bench / specs) calls [[releaseAll]] after materializing each
  * query, so no MEMORY_AND_DISK blocks outlive the query that created
  * them. Session-scoped caches that are MEANT to outlive a query (derived
  * graphs in `Tables.cached`, the memoized IVF index) do not go through
  * here. */
object CacheScope {
  private val live = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  private[graft] def cached(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    live += p
    p
  }

  /** Unpersist every registered operator-local cache. Blocking=false: the
    * blocks are dropped asynchronously, the plans remain valid (they just
    * recompute if re-used). */
  def releaseAll(): Unit = synchronized {
    live.foreach(_.unpersist(false))
    live.clear()
  }
}
