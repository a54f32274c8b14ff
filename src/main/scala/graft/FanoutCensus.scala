package graft

import org.apache.spark.sql.SparkSession

/** Prefix-filter fan-out census (judge r10 ask #4): records the stage
  * cardinalities of q_jaccard_prefix — docs → shingle rows → prefix-index
  * rows → candidate pairs → verified pairs — at each given corpus dir
  * (default: sf0.1 and the Bench-derived disjoint 10× corpus), so the
  * candidate-growth constant behind the 2.85 10× time ratio is a
  * committed artifact rather than a guess. Writes one JSON line per dir
  * to PREFIX_FANOUT.json and stdout.
  *
  * Usage: runMain graft.FanoutCensus [dir ...]
  */
object FanoutCensus {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1_derived")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lines = dirs.flatMap { d =>
      if (!new java.io.File(s"$d/documents.parquet").exists()) {
        System.err.println(s"[fanout] skipping $d — no documents.parquet")
        None
      } else {
        val r = graft.operators.Dedup.prefixJaccardCensus(spark, d).head()
        val (docs, shRows, pref, cand, pass) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        val perDoc = math.round(cand.toDouble / docs * 1000) / 1000.0
        val line = s"""{"dir":"$d","n_docs":$docs,"n_shingle_rows":$shRows,""" +
          s""""n_prefix_rows":$pref,"n_cand_pairs":$cand,"n_pass_pairs":$pass,""" +
          s""""cand_per_doc":$perDoc}"""
        println(line)
        Some(line)
      }
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/PREFIX_FANOUT.json"),
      lines.mkString("", "\n", "\n"))
    spark.stop()
  }
}
