package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The shared per-(session, dir) cache used by the operator files for
  * expensive intermediates (signatures, centroids, edge lists). The
  * contract: entries are memoized per key, and ALL of a context's
  * entries are dropped when its application ends — a long-lived JVM
  * (test suite, multi-session driver) must not accumulate references
  * to DataFrames of dead sessions.
  */
class SessionCacheSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Engine.session(master = "local[4]")

  test("memoizes per key and evicts on application end") {
    val cache = new SessionCache
    var builds = 0
    def get(key: String) = cache.getOrElseUpdate(spark, key) {
      builds += 1
      spark.range(3).toDF("x")
    }
    get("a"); get("a"); get("b")
    assert(builds == 2)
    assert(cache.size == 2)

    // the listener path calls exactly this on SparkListenerApplicationEnd
    SessionCache.evictAllFor(spark.sparkContext)
    assert(cache.size == 0)

    // a fresh session generation rebuilds instead of hitting stale refs
    get("a")
    assert(builds == 3)
  }
}
