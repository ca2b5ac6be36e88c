package graft

import graft.util.SessionCache

/** The artifact cache backing IVF assignment and dup-group reuse:
  * hit-returns-cached, bounded LRU eviction, access refreshes recency. */
class SessionCacheSpec extends SparkSpec {

  test("hits return the cached value without rebuilding") {
    val c = new SessionCache[String](maxEntries = 2)
    var builds = 0
    def build(v: String): String = { builds += 1; v }
    assert(c.getOrBuild(spark, "a")(build("va")) == "va")
    assert(c.getOrBuild(spark, "a")(build("IGNORED")) == "va")
    assert(builds == 1)
  }

  test("bounded LRU evicts the least recently used entry") {
    val c = new SessionCache[String](maxEntries = 2)
    c.getOrBuild(spark, "a")("va")
    c.getOrBuild(spark, "b")("vb")
    c.getOrBuild(spark, "a")("x") // refresh a => b is now LRU
    c.getOrBuild(spark, "c")("vc") // evicts b
    var rebuiltB = false
    assert(c.getOrBuild(spark, "b")({ rebuiltB = true; "vb2" }) == "vb2" && rebuiltB,
      "evicted entry must rebuild")
    // a was evicted when b rebuilt (capacity 2: c + b resident now)
    var rebuiltC = false
    assert(c.getOrBuild(spark, "c")({ rebuiltC = true; "x" }) == "vc" && !rebuiltC,
      "recently used entry must survive")
  }
}
