package graft

/** The `store` listing (reference server.rs:16-40): the per-node "what
  * do I hold" view — registered tables with their block-store status.
  */
class ReplSpec extends SparkSuite {

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
