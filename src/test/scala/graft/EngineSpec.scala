package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** SQL-text entry concurrency: registration state is striped per session
  * (a concurrent-user engine must not serialize every submission on one
  * JVM-wide monitor) and concurrent sessions on different directories
  * never see each other's views. */
class EngineSpec extends SparkSpec {

  private val dirA = sfDir                      // sf0.001
  private val dirB = "/root/testdata/sf0.01"

  test("registration locks are per-session, stable per session") {
    val s2 = spark.newSession()
    assert(Engine.lockFor(spark) ne Engine.lockFor(s2),
      "distinct sessions must not share a registration lock")
    assert(Engine.lockFor(spark) eq Engine.lockFor(spark))
    assert(Engine.lockFor(s2) eq Engine.lockFor(s2))
  }

  test("concurrent sessions on different dirs query without cross-talk") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    val expectA = spark.read.parquet(s"$dirA/orders.parquet").count()
    val expectB = spark.read.parquet(s"$dirB/orders.parquet").count()
    assert(expectA != expectB, "scale factors must differ for this test to bite")
    val sql = "SELECT count(*) AS n FROM orders"
    def run(s: org.apache.spark.sql.SparkSession, dir: String): Seq[Long] =
      (1 to 5).map(_ => Engine.executeQuery(s, dir, sql).collect()(0).getLong(0))
    val fa = Future(run(s1, dirA))
    val fb = Future(run(s2, dirB))
    assert(Await.result(fa, 120.seconds).forall(_ == expectA),
      "session A must always see dirA's tables")
    assert(Await.result(fb, 120.seconds).forall(_ == expectB),
      "session B must always see dirB's tables")
  }

  test("one session swapping dirs re-registers, under its own lock only") {
    val s = spark.newSession()
    val expectA = spark.read.parquet(s"$dirA/orders.parquet").count()
    val expectB = spark.read.parquet(s"$dirB/orders.parquet").count()
    val sql = "SELECT count(*) AS n FROM orders"
    (1 to 2).foreach { _ =>
      assert(Engine.executeQuery(s, dirA, sql).collect()(0).getLong(0) == expectA)
      assert(Engine.executeQuery(s, dirB, sql).collect()(0).getLong(0) == expectB)
    }
  }
}
