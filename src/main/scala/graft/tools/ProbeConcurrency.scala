package graft.tools

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}
import graft.GraftSession

/** Measured multi-query THROUGHPUT of one engine session — the
  * client/server deployment story quantified. The reference's primary
  * shape is a server answering concurrent clients over one shared cache
  * (`fpdb-main/src/Server.cpp`); graft's analog is N threads through one
  * SparkSession's `Engine.executeQuery` (what `graft.Server` exposes
  * over JDBC). EngineSpec pins correctness under that concurrency; this
  * probe pins the ECONOMICS: Spark schedules concurrent jobs across the
  * shared executor pool, so the expected win is filling the gaps one
  * query leaves idle — driver-side planning/analysis time, straggler
  * tails, under-parallel stages — not an N× miracle.
  *
  * Run: `sbt "runMain graft.tools.ProbeConcurrency /root/testdata/sf0.1 4 2"`
  * Prints one line: serial secs, concurrent secs (same total workload),
  * and the throughput ratio.
  */
object ProbeConcurrency {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threads = args.lift(1).map(_.toInt).getOrElse(4)
    val rounds = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get("graft-probe-conc", cpus)
    spark.sparkContext.setLogLevel("WARN")
    // a mixed corpus slice: joins, aggs, a semi-join, a star query
    val workload: Seq[String] =
      (Seq(1, 3, 5, 6, 12, 14).map(graft.operators.TpchCorpus.sql) ++
        Seq(graft.operators.SsbCorpus.sql("2_1"))) flatMap
        (q => Seq.fill(rounds)(q))
    def runOne(q: String): Unit = {
      val n = graft.Engine.executeQuery(spark, dir, q).count()
      require(n >= 0)
    }
    workload.foreach(runOne) // warm: artifacts, code, page cache
    val t0 = System.nanoTime()
    workload.foreach(runOne)
    val serial = (System.nanoTime() - t0) / 1e9
    val queue = new ConcurrentLinkedQueue[String]()
    workload.foreach(queue.add)
    val done = new CountDownLatch(threads)
    val errs = new java.util.concurrent.atomic.AtomicInteger(0)
    val t1 = System.nanoTime()
    (1 to threads).foreach { _ =>
      new Thread(() => {
        try {
          var q = queue.poll()
          while (q != null) { runOne(q); q = queue.poll() }
        } catch { case e: Throwable => errs.incrementAndGet(); throw e }
        finally done.countDown()
      }).start()
    }
    done.await()
    val conc = (System.nanoTime() - t1) / 1e9
    require(errs.get() == 0, s"${errs.get()} worker(s) failed")
    println(f"""{"probe":"concurrency","queries":${workload.size},"threads":$threads,"serial_s":$serial%.2f,"concurrent_s":$conc%.2f,"throughput_x":${serial / conc}%.2f}""")
    spark.stop()
  }
}
