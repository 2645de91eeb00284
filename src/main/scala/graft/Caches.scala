package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Cache ownership policy for the library's shared intermediates.
  *
  * Several operators persist a subtree that feeds multiple consumers in
  * the SAME plan (e.g. both sides of a self-join) or is shared across
  * queries via CacheManager's canonical-plan matching (shingle tables).
  * Those persists are load-bearing — unpersisting after the first action
  * would forfeit the cross-query reuse the bench measures — so the
  * LIBRARY does not unpersist them. Lifecycle belongs to the caller:
  *
  *  - short-lived jobs: nothing to do, caches die with the session;
  *  - long-lived sessions: call [[clearAll]] between workloads (or
  *    `df.unpersist()` on the returned frames) to release executor
  *    storage memory.
  *
  * Iterative operators that persist per-round intermediates (the
  * connected-components loop) DO unpersist internally — their plans are
  * unique per round, so nothing downstream can ever reuse them.
  */
object Caches {

  /** Persist `df` unless its canonical plan is already cached.
    *
    * `Dataset.storageLevel` consults the session CacheManager, so when a
    * rebuilt DataFrame has the same canonical plan as an earlier
    * persisted one this is a no-op instead of the "Asked to cache
    * already cached data" warning (the second `persist` would be
    * ignored anyway — this just makes the idempotence explicit).
    */
  def persistOnce(df: DataFrame,
                  level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.persist(level) else df

  /** Drop every cached plan in the session — the one-call lifecycle hook
    * for long-lived callers.
    */
  def clearAll(spark: SparkSession): Unit = spark.catalog.clearCache()
}
