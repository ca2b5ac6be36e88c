package graft

import java.sql.DriverManager
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** The long-running server entry point: a real HiveServer2 thrift
  * round-trip (the reference's client/server deployment model,
  * `fpdb-main/src/Server.cpp`) — JDBC clients connect over the wire,
  * query the registered catalog INCLUDING the materialized partsupp
  * artifact, and concurrent connections share one engine. */
class ServerSpec extends SparkSpec {

  test("thrift server serves JDBC clients against the engine catalog") {
    val port = {
      // a free ephemeral port, released before the server binds it
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    val server = Server.start(spark, sfDir, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val url = s"jdbc:hive2://localhost:$port/"
      // the server needs a beat to open its listener
      var conn: java.sql.Connection = null
      var attempts = 0
      while (conn == null) {
        try conn = DriverManager.getConnection(url, "graft", "")
        catch { case e: java.sql.SQLException =>
          attempts += 1
          if (attempts > 60) throw e
          Thread.sleep(500)
        }
      }
      try {
        // base-table query over the wire == direct engine result
        val st = conn.createStatement()
        val rs = st.executeQuery(
          "SELECT count(*) AS n, sum(l_quantity) AS q FROM lineitem")
        assert(rs.next())
        val direct = graft.sources.Tables.lineitem(spark, sfDir)
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.sum("l_quantity"))
          .collect()(0)
        assert(rs.getLong(1) == direct.getLong(0), "JDBC count must match engine")
        assert(math.abs(rs.getDouble(2) - direct.getDouble(1)) < 1e-6)
        rs.close()
        // the DERIVED catalog: partsupp is queryable as a base table —
        // the materialized artifact, exactly what a reference client sees
        val ps = st.executeQuery("SELECT count(*) AS n FROM partsupp")
        assert(ps.next() && ps.getLong(1) > 0,
          "materialized partsupp must be served as a base table")
        ps.close()
        st.close()
      } finally conn.close()

      // concurrent connections share the one engine (singleSession):
      // every client sees the same catalog and gets the same answer
      val expect = graft.sources.Tables.orders(spark, sfDir).count()
      val results = Await.result(Future.traverse((1 to 4).toVector) { _ =>
        Future {
          val c = DriverManager.getConnection(url, "graft", "")
          try {
            val r = c.createStatement()
              .executeQuery("SELECT count(*) AS n FROM orders")
            assert(r.next()); r.getLong(1)
          } finally c.close()
        }
      }, 120.seconds)
      assert(results.forall(_ == expect),
        s"all concurrent JDBC clients must see the shared catalog: $results")

      // ---- mode-routed concurrency on the server's shared session (r12)
      // A JDBC client SETs the deployment mode; it lands on the SHARED
      // single-session conf (the exec.conf contract) and governs every
      // query entering the engine from then on. The thrift SELECTs
      // themselves execute spark.sql directly (transport parity, not
      // mode parity — Engine.executeQuery's scaladoc states the
      // boundary and why routing is not a Catalyst rule), so the pinned
      // combination is: wire clients SETting + querying WHILE
      // conf-routed engine queries run concurrently on the same
      // session, serial-equal results and no leaked pushdown slots.
      val sql = "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1"
      val baseline = Engine.executeQuery(spark, sfDir, sql) // conf unset
        .collect().map(_.toSeq).toSeq
      val cache = graft.cache.HybridScan.segmentCache(spark, sfDir)
      try {
        val c = DriverManager.getConnection(url, "graft", "")
        try c.createStatement().execute("SET spark.graft.scanMode=hybrid")
        finally c.close()
        assert(spark.conf.get("spark.graft.scanMode") == "hybrid",
          "a JDBC SET must land on the shared session conf")
        val router = graft.cache.HybridScan.sessionRouter(spark, sfDir)
        val slots0 = router.availableSlots
        val mixed = Await.result(Future.traverse((1 to 8).toVector) { i =>
          Future {
            if (i % 2 == 0) {
              // conf-routed engine query — the conf route holds no
              // session-global bracket (no pullup conf toggle; leases
              // close at plan time), so it is safe to run concurrently
              // with the wire clients by construction
              Engine.executeQuery(spark, sfDir, sql)
                .collect().map(_.toSeq).toSeq
            } else {
              val c = DriverManager.getConnection(url, "graft", "")
              try {
                val r = c.createStatement().executeQuery(sql)
                val buf = scala.collection.mutable.Buffer.empty[Seq[Any]]
                while (r.next()) buf += Seq(r.getString(1), r.getLong(2))
                buf.toSeq
              } finally c.close()
            }
          }
        }, 180.seconds)
        assert(mixed.forall(_ == baseline),
          "every concurrent client, routed or wire, must equal the serial result")
        assert(router.pushdowns + router.pullups + router.cacheOnlys +
          router.hybrids > 0, "the engine queries must have routed")
        assert(router.availableSlots == slots0,
          s"pushdown slots must all be released: ${router.availableSlots} vs $slots0")
      } finally {
        spark.conf.unset("spark.graft.scanMode")
        cache.invalidateAll()
      }
    } finally server.stop()
  }
}
