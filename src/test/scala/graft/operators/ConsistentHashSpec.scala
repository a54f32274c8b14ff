package graft.operators

import graft.SparkSpec

/** HRW invariant: adding a shard only moves docs TO the new shard, and
  * the operator's counts match a JVM replay of the same hashes. */
class ConsistentHashSpec extends SparkSpec {

  private def h56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.substring(0, 14), 16)
  }
  private def shard(id: Long, n: Int): Int =
    (0 until n).maxBy(s => (h56(s"$id#$s"), s))

  test("scale-up moves only to the new shard; counts match the JVM replay") {
    val spark2 = spark
    import spark2.implicits._
    val ids = (1L to 300L)
    val expectMoved = ids.count { id =>
      val (o, n) = (shard(id, TextAnalysis.HrwOld), shard(id, TextAnalysis.HrwNew))
      // THE consistent-hashing property: o != n implies n is the added shard
      assert(o == n || n == TextAnalysis.HrwOld, s"doc $id moved $o -> $n")
      o != n
    }
    val r = TextAnalysis.consistentHashDf(ids.toDF("doc_id")).collect()(0)
    assert(r.getAs[Long]("n_docs") == 300L)
    assert(r.getAs[Long]("n_moved") == expectMoved.toLong)
    assert(r.getAs[Long]("n_moved") < 300 / 4, "far fewer than mod-N's 8/9")
  }
}
