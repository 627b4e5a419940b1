package graft

/** The `store` listing (reference server.rs:16-40): the per-node "what
  * do I hold" view — registered tables with their block-store status.
  */
class ReplSpec extends SparkSuite {

  test("unregistered user script runs end-to-end via the pipe executor") {
    // The reference's extension point is "run ANY script as map/reduce"
    // (sdfs/src/server.rs:371-387). Exercise it with scripts the repo
    // has never seen: a sh tokenizer map and an awk summing reduce,
    // driven through the same runMaple/runJuice paths the REPL uses.
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    withLogLevel {
      val dir = Files.createTempDirectory("graft-pipe")
      val mapSh = dir.resolve("usermap.sh")
      Files.write(mapSh,
        "#!/bin/sh\ntr ' ' '\\n' | grep -v '^$' | sed 's/$/\\t1/'\n".getBytes)
      val redSh = dir.resolve("userreduce.sh")
      Files.write(redSh,
        "#!/bin/sh\nawk -F'\\t' '{c[$1]+=$2} END {for (k in c) print k\"\\t\"c[k]}'\n".getBytes)
      Seq(mapSh, redSh).foreach(_.toFile.setExecutable(true))

      Seq("a b b", "c a", "b").toDF("value")
        .createOrReplaceTempView("pipe_in")
      try {
        val m = graft.tools.Repl.runMaple(spark, mapSh.toString,
          "pipe_kv", "pipe_in", Nil)
        assert(m.contains("(pipe)"), m)
        val j = graft.tools.Repl.runJuice(spark, redSh.toString,
          "pipe_kv", "pipe_out", Nil)
        assert(j.contains("(pipe)"), j)
        val got = spark.table("pipe_out")
          .select($"key", $"value".cast("long").as("n"))
          .as[(String, Long)].collect().toMap
        assert(got == Map("a" -> 2L, "b" -> 3L, "c" -> 1L), got)
        // a nonexistent path still reports the registry, not a crash
        val miss = graft.tools.Repl.runMaple(spark, "no_such.py",
          "x", "pipe_in", Nil)
        assert(miss.startsWith("unknown map executor"), miss)
        // .py resolution: commandFor wraps user scripts in python3 and
        // passes CLI args through (the reference's exact contract)
        assert(graft.mr.PipeExec.commandFor("my.py", Seq("a", "b")) ==
          Seq("python3", "my.py", "a", "b"))
        assert(graft.mr.PipeExec.commandFor("/bin/tool", Nil) == Seq("/bin/tool"))
        // and a real python3 script runs end-to-end (the reference's
        // executors are python scripts — this is their literal path)
        val mapPy = dir.resolve("usermap.py")
        Files.write(mapPy, ("import sys\n" +
          "for line in sys.stdin:\n" +
          "    for w in line.split():\n" +
          "        print(w + '\\t1')\n").getBytes)
        val mp = graft.tools.Repl.runMaple(spark, mapPy.toString,
          "pipe_kv_py", "pipe_in", Nil)
        assert(mp.contains("(pipe)"), mp)
        val pyPairs = spark.table("pipe_kv_py").count()
        assert(pyPairs == 6L, s"expected 6 (word,1) pairs, got $pyPairs")
        Files.deleteIfExists(mapPy)
        spark.catalog.dropTempView("pipe_kv_py")
        // juice forwards CLI args to the reduce script (symmetric with
        // maple): an awk reducer that scales every sum by its first arg
        val redArg = dir.resolve("userreduce_arg.sh")
        Files.write(redArg,
          ("#!/bin/sh\n" +
            "awk -F'\\t' -v m=\"$1\" '{c[$1]+=$2} END {for (k in c) print k\"\\t\"c[k]*m}'\n").getBytes)
        redArg.toFile.setExecutable(true)
        val ja = graft.tools.Repl.runJuice(spark, redArg.toString,
          "pipe_kv", "pipe_out_arg", Seq("10"))
        assert(ja.contains("(pipe)"), ja)
        val scaled = spark.table("pipe_out_arg")
          .select($"key", $"value".cast("long").as("n"))
          .as[(String, Long)].collect().toMap
        assert(scaled == Map("a" -> 20L, "b" -> 30L, "c" -> 10L), scaled)
        Files.deleteIfExists(redArg)
        spark.catalog.dropTempView("pipe_out_arg")
      } finally {
        Seq("pipe_in", "pipe_kv", "pipe_out")
          .foreach(spark.catalog.dropTempView(_))
        Seq(mapSh, redSh, dir).foreach(p => Files.deleteIfExists(p))
      }
    }
  }

  test("store lists registered tables with cache status") {
    import spark.implicits._
    withLogLevel {
      Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView("store_demo")
      spark.catalog.cacheTable("store_demo")
      try {
        val cachedLines = graft.tools.Repl.storeListing(spark)
        assert(cachedLines.exists(l =>
          l.startsWith("store_demo\t") && l.endsWith("\tcached")))
        spark.catalog.uncacheTable("store_demo")
        val coldLines = graft.tools.Repl.storeListing(spark)
        assert(coldLines.exists(l =>
          l.startsWith("store_demo\t") && l.endsWith("\ton-demand")))
      } finally spark.catalog.dropTempView("store_demo")
    }
  }
}
