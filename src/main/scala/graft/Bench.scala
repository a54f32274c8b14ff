package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query wall seconds at
  * SPARK_GRAFT_SF_DIR (driver grades sf0.1 against BASELINE.md).
  *
  * Materialization is a noop-format write (full computation of every
  * output row, nothing skipped by count-only pruning), after a warmup
  * pass that touches each parquet input and JITs the common codegen
  * paths. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: scan every table once (page cache + codegen JIT)
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }

    // dev loop: SPARK_GRAFT_BENCH_ONLY=q_a,q_b runs a subset;
    // SPARK_GRAFT_EXPLAIN=1 dumps the formatted plan per query.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
    val results = selected.map { case (name, fn) =>
      if (explain) {
        System.err.println(s"===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => System.err.println(e.getMessage) }
      }
      val t0 = System.nanoTime()
      val ok = try { materialize(fn(spark, sfDir)); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
