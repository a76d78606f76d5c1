package graft

import graft.sinks.EsSink
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** The long-running application entry (Serve): boots every conf,
  * follows the feed live, hot-adds confs mid-run, drains cleanly on the
  * STOP file, and leaves checkpoints behind for the next run — the
  * process-lifecycle contract of the reference's boot class
  * (CDCApplication.java) over our watcher machinery.
  */
class ServeSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def wire(table: String, id: Long, v: String, off: Long): String = {
    val ev = s"""{"payload":{"before":null,"after":{"id":$id,"v":"$v"},""" +
      s""""source":{"db":"d","table":"$table","ts_ms":$off},"op":"c","ts_ms":$off}}"""
    s"""{"value":${mapper.writeValueAsString(ev)},"offset":$off}"""
  }

  private def await(deadlineMs: Long = 30000L)(cond: => Boolean): Boolean = {
    val end = System.currentTimeMillis() + deadlineMs
    while (!cond && System.currentTimeMillis() < end) Thread.sleep(100)
    cond
  }

  test("Serve.run: boot serves, live feed follows, hot-add conf serves, STOP drains, checkpoints survive") {
    val confDir = Files.createTempDirectory("graft_serve_conf_").toFile
    Files.write(new java.io.File(confDir, "t.json").toPath, Seq(
      """{"name":"t_pipe","databases":["d"],"tables":["t"],"idKey":"id","schema":"id BIGINT, v STRING"}""").asJava)
    val srcDir = Files.createTempDirectory("graft_serve_src_").toFile
    Files.write(new java.io.File(srcDir, "000.json").toPath,
      Seq(wire("t", 1, "boot", 1)).asJava)
    val workRoot = Files.createTempDirectory("graft_serve_work_").toString
    val storeDir = Files.createTempDirectory("graft_serve_store_").toString
    val store = new java.io.File(storeDir)
    def doc(id: Long): java.io.File = new java.io.File(store, s"$id.json")

    val cfg = EsSink.Config("http://graft-local/serve", "", "", "id")
    @volatile var booted = -1
    @volatile var failure: Throwable = null
    val server = new Thread(() => {
      try booted = Serve.run(spark, confDir.toString, srcDir.toString,
        workRoot, cfg, new EsSink.FileDocStore(storeDir), pollMs = 100L)
      catch { case e: Throwable => failure = e }
    }, "serve-under-test")
    server.start()
    try {
      // boot: the conf'd pipeline serves the pre-existing feed
      assert(await()(doc(1).exists()), "boot feed must be served")
      // live: a feed file written AFTER boot is served WITHOUT any conf
      // touch — the processing-time lww trigger follows the source
      Files.write(new java.io.File(srcDir, "001.json").toPath,
        Seq(wire("t", 2, "live", 2)).asJava)
      assert(await()(doc(2).exists()), "live feed must be served")
      // hot-add: a brand-new conf starts mid-run via the watcher loop
      Files.write(new java.io.File(confDir, "u.json").toPath, Seq(
        """{"name":"u_pipe","databases":["d"],"tables":["u"],"idKey":"id","schema":"id BIGINT, v STRING"}""").asJava)
      Files.write(new java.io.File(srcDir, "002.json").toPath,
        Seq(wire("u", 3, "added", 3)).asJava)
      assert(await()(doc(3).exists()), "hot-added conf must serve")
      // STOP file drains the server thread
      Files.createFile(java.nio.file.Paths.get(workRoot, "STOP"))
      server.join(30000)
      assert(!server.isAlive, "server must exit on STOP")
      assert(failure == null, s"server failed: $failure")
      assert(booted == 1, "one query booted from the initial conf dir")
      // checkpoints survive the stop — the next run's resume point
      val ckpts = new java.io.File(s"$workRoot/ckpt").listFiles()
      assert(ckpts != null && ckpts.length == 2,
        "both pipelines leave a checkpoint dir")
      // restart: a second run resumes from the cursors — the already-
      // served feed is NOT re-sent (store files' mtimes stay put), new
      // feed is
      val before = Seq(1L, 2L, 3L).map(i => doc(i).lastModified())
      Files.delete(java.nio.file.Paths.get(workRoot, "STOP"))
      @volatile var failure2: Throwable = null
      val server2 = new Thread(() => {
        try Serve.run(spark, confDir.toString, srcDir.toString,
          workRoot, cfg, new EsSink.FileDocStore(storeDir), pollMs = 100L)
        catch { case e: Throwable => failure2 = e }
      }, "serve-under-test-2")
      server2.start()
      try {
        Files.write(new java.io.File(srcDir, "003.json").toPath,
          Seq(wire("t", 4, "after-restart", 4)).asJava)
        assert(await()(doc(4).exists()), "post-restart feed must be served")
        assert(Seq(1L, 2L, 3L).map(i => doc(i).lastModified()) == before,
          "a restarted server must not re-send already-served documents")
      } finally {
        Files.createFile(java.nio.file.Paths.get(workRoot, "STOP"))
        server2.join(30000)
        assert(!server2.isAlive)
        assert(failure2 == null, s"restarted server failed: $failure2")
      }
    } finally if (server.isAlive) {
      try Files.createFile(java.nio.file.Paths.get(workRoot, "STOP"))
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      server.join(30000)
    }
  }
}
