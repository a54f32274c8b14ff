package graft

import org.apache.spark.SparkConf

/** Shared engine tuning for the two driver-run mains (Bench, Verify).
  *
  * Both mains MUST read the same defaults and the same env overrides,
  * or an env-driven A/B bench run silently measures plans that were
  * never verified under that config (r15 advice: Verify hardcoded the
  * tuned values, breaking the "verified plans are the benched plans"
  * invariant exactly when an override was used).
  *
  * Defaults (r16, re-measured per tier — see OPTIMIZATION_r16.md):
  *  - preferSortMergeJoin stays at Spark's default TRUE. r15 shipped
  *    `false` (guide §9's baseline) and the driver's twice-timed record
  *    showed the planner's estimate-based SHJ picks anti-scale: every
  *    big regression was sf1-only while the sf0.1 twin stayed flat
  *    (sf1_q_jaccard_prefix 3.4×, sf1_q_bloom_decon 1.4×,
  *    sf1_q_substring_dedup 1.6×, sf1_q_kcore 1.4×) — at 10× the
  *    estimated build side crosses the per-partition budget and a
  *    single-threaded hash build + spill replaces the SMJ that was
  *    right. Guide §3.1 says pick the strategy per join from evidence;
  *    the AQE threshold below is that evidence-based path.
  *  - AQE maxShuffledHashJoinLocalMapThreshold=64m is kept: it converts
  *    SMJ→SHJ only when the RUNTIME per-partition build size fits — a
  *    per-partition byte bound that AQE re-decides from real sizes at
  *    any scale (scale-invariant by construction).
  *  - Kryo serializer is kept for the RDD-path shuffles (GraphX CC,
  *    tsqr R-factor treeReduce, GMM treeAggregate buffers, BlockMatrix
  *    tiles) — r15 driver record: algo_transpose 4.2×, algo_tsqr 1.9×,
  *    algo_gmm 2.0× — now WITH class registration (below), which
  *    GraphX's own docs require for Kryo to pay off (r15 shipped it
  *    unregistered and algo_cc_graphx regressed 1.6×).
  */
object EngineConf {

  /** Value types that cross RDD shuffles / tree aggregations in the
    * graft code paths. Registration shrinks every serialized instance
    * by the fully-qualified class name Kryo otherwise writes. */
  private def graftKryoClasses: Array[Class[_]] = Array(
    classOf[Array[Double]],
    classOf[Array[Long]],
    classOf[Array[Int]],
    classOf[Array[Array[Double]]],
    classOf[Array[Array[Array[Double]]]],
    // tsqr treeReduce merges breeze R factors; GMM models carry BDV/BDM
    classOf[breeze.linalg.DenseMatrix[Double]],
    classOf[breeze.linalg.DenseVector[Double]],
    // DsArray/BlockMatrix tiles ((Int, Int) -> mllib Matrix)
    classOf[org.apache.spark.mllib.linalg.DenseMatrix],
    classOf[org.apache.spark.mllib.linalg.SparseMatrix],
    classOf[org.apache.spark.mllib.linalg.DenseVector],
    classOf[org.apache.spark.mllib.linalg.SparseVector],
    classOf[scala.Tuple2[_, _]],
    classOf[scala.Tuple3[_, _, _]]
  )

  /** The env-overridable engine tunables + Kryo registration, shared
    * verbatim by Bench and Verify. */
  def tuned(): SparkConf = {
    // single-threaded f2j DLAMCH init BEFORE any parallel LAPACK call —
    // see LapackInit: the unsynchronized static lazy init can hang a
    // racing task forever in DLARFG's rescale loop
    graft.linalg.LapackInit.forced
    val conf = new SparkConf()
    conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
      sys.env.getOrElse("SPARK_GRAFT_SHJ_THRESHOLD", "64m"))
    conf.set("spark.sql.join.preferSortMergeJoin",
      sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "true"))
    conf.set("spark.serializer", sys.env.getOrElse("SPARK_GRAFT_SERIALIZER",
      "org.apache.spark.serializer.KryoSerializer"))
    // registration is serializer-independent metadata: harmless under
    // java, required-for-payoff under kryo (GraphX programming guide)
    org.apache.spark.graphx.GraphXUtils.registerKryoClasses(conf)
    conf.registerKryoClasses(graftKryoClasses)
    conf
  }
}
