package graft

import org.apache.spark.sql.DataFrame

/** Gate-query hygiene helpers. */
object GateUtil {
  /** Materialize a (small) result, run `free` (unpersist working
    * caches), and return the rows as a local-relation DataFrame — so no
    * cache outlives its query to GC-thrash whichever query runs next in
    * Verify/Bench (each leaked cache is invisible to per-query timing
    * but taxes the rest of the session). */
  def pinned(out: DataFrame)(free: => Unit): DataFrame = {
    val rows = out.collect()
    val schema = out.schema
    free
    out.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
  }
}
