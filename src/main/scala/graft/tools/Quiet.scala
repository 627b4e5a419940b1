package graft.tools

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.config.Configurator

/** Targeted log hygiene for the entry-point mains. */
object Quiet {

  /** The grand-total windows in q4/q6/the wordcount finalizers run
    * over already-aggregated group rows (group-cardinality input, not
    * N — see SCALING.md), so WindowExec's "No Partition Defined …
    * moving all data to a single partition" WARN is expected and
    * benign exactly there. Route that one logger to ERROR; every
    * other warning stays visible.
    */
  def windowWarn(): Unit =
    Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec", Level.ERROR)
}
