package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memoization of resolved DataFrames.
  *
  * Weakly keyed on the session OBJECT: a stopped-and-collected session never
  * pins its resolved relations, and (unlike an identity-hash key) a new
  * session that happens to reuse a collected session's identity hash can
  * never be served the dead session's plans.
  */
object DfCache {
  private val bySession =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, DataFrame]]

  def get(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val m = bySession.synchronized {
      var t = bySession.get(spark)
      if (t == null) {
        t = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        bySession.put(spark, t)
      }
      t
    }
    m.getOrElseUpdate(key, build)
  }
}
