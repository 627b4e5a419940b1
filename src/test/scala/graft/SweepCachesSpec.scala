package graft

import graft.tools.SweepCaches

/** Pins the hand-maintained SweepCaches consumer sets against the real
  * sweep: the sets must name actual SparkEntry.queries entries, and —
  * the property the class exists for — once a family's last consumer
  * finishes and its caches are released, NO later query in the sweep
  * may repopulate them (a reader missing from the set would refit per
  * query AND re-pin the cache for the rest of the run, the exact
  * residency leak SweepCaches fixes). Verified with the families'
  * cacheBuilds/quantizerFits counters over a full sf0.001 sweep in
  * SparkEntry.queries order — the same order Verify and Bench use.
  */
class SweepCachesSpec extends SparkSuite {
  private val dataDir = "/root/testdata/sf0.001"

  test("consumer sets name real SparkEntry.queries entries") {
    val names = SparkEntry.queries.keySet
    val unknownSim = SweepCaches.simConsumers.diff(names)
    val unknownDedup = SweepCaches.dedupConsumers.diff(names)
    val unknownCorpus = SweepCaches.corpusConsumers.diff(names)
    assert(unknownSim.isEmpty, s"simConsumers not in queries: $unknownSim")
    assert(unknownDedup.isEmpty, s"dedupConsumers not in queries: $unknownDedup")
    assert(unknownCorpus.isEmpty, s"corpusConsumers not in queries: $unknownCorpus")
  }

  test("full sweep: no family cache repopulates after its consumer set drains") {
    spark.sparkContext.setLogLevel("WARN")
    SweepCaches.releaseAll()
    val tracker = new SweepCaches.Tracker
    def simBuilds(): Int =
      graft.sim.Similarity.cacheBuilds.get() + graft.sim.Similarity.quantizerFits.get()
    def dedupBuilds(): Int = graft.dedup.Dedup.cacheBuilds.get()
    def corpusBuilds(): Int = graft.pipeline.CorpusOps.cacheBuilds.get()
    var simAtDrain: Option[Int] = None
    var dedupAtDrain: Option[Int] = None
    var corpusAtDrain: Option[Int] = None
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, dataDir).count()
      tracker.done(name)
      simAtDrain.foreach(n => assert(simBuilds() == n,
        s"sim family cache repopulated after drain, at query $name"))
      dedupAtDrain.foreach(n => assert(dedupBuilds() == n,
        s"dedup family cache repopulated after drain, at query $name"))
      corpusAtDrain.foreach(n => assert(corpusBuilds() == n,
        s"corpus family cache repopulated after drain, at query $name"))
      if (simAtDrain.isEmpty && tracker.simDrained) simAtDrain = Some(simBuilds())
      if (dedupAtDrain.isEmpty && tracker.dedupDrained) dedupAtDrain = Some(dedupBuilds())
      if (corpusAtDrain.isEmpty && tracker.corpusDrained) corpusAtDrain = Some(corpusBuilds())
    }
    assert(simAtDrain.isDefined && dedupAtDrain.isDefined && corpusAtDrain.isDefined,
      "all three families must drain in a full sweep")
    SweepCaches.releaseAll()
  }
}
