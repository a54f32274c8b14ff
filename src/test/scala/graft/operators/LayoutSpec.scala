package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout must deliver its reason to exist: per-file min/max
  * spans shrink in BOTH dimensions at once (file skipping works for
  * predicates on either), where a single-column sort leaves the other
  * dimension spanning ~the full range in every file. */
class LayoutSpec extends SparkSpec {

  private def meanSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
    val spans = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .agg(avg("sx"), avg("sy")).head()
    (spans.getDouble(0), spans.getDouble(1))
  }

  test("z-order shrinks both dimension spans; plain sort only its own") {
    val spark2 = spark
    import spark2.implicits._
    val rng = new java.util.Random(7)
    val pts = Seq.fill(20000)((rng.nextDouble(), rng.nextDouble()))
    val df = pts.toDF("x", "y").repartition(8)

    val z = Layout.zorderLayout(df, "x", "y", bits = 8, numFiles = 16).cache()
    z.count()
    val (zx, zy) = meanSpans(z)
    // 16 contiguous key ranges of a 256×256 Morton curve ≈ square-ish
    // tiles: both dims must cluster well below the unit global span
    assert(zx < 0.6 && zy < 0.6, s"z-order spans must shrink in both dims: x=$zx y=$zy")

    val s = df.repartitionByRange(16, col("x")).sortWithinPartitions("x").cache()
    s.count()
    val (sx, sy) = meanSpans(s)
    assert(sx < 0.2, s"x-sort clusters x: $sx")
    assert(sy > 0.9, s"x-sort leaves y unclustered (~full span): $sy")
    // the z-order y-span must beat the single-sort y-span decisively
    assert(zy < sy / 2, s"z-order must halve the unsorted-dim span: $zy vs $sy")
    z.unpersist(); s.unpersist()
  }

  test("morton key interleaves bits exactly") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((5L, 3L)).toDF("a", "b") // a = 101, b = 011
    val k = df.select(Layout.mortonKey(col("a"), col("b"), 3).as("k"))
      .head().getLong(0)
    // even positions from a (1,0,1), odd from b (1,1,0): bits 0..5 =
    // a0,b0,a1,b1,a2,b2 = 1,1,0,1,1,0 → 0b011011 = 27
    assert(k == 27L, s"got $k")
  }
}
