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

  test("spatialJoin finds cross-cell pairs exactly once, excludes r+1") {
    val spark2 = spark
    import spark2.implicits._
    // r=10, cells of 10: (9,9)-(11,11) straddles a cell CORNER (diag
    // neighbor), (19,5)-(21,5) a vertical edge; (40,40)-(40,51) is
    // dist 11 > 10 → excluded; (70,70)-(76,78) same cell dist2=100=r²
    // → included at exactly the boundary
    val pts = Seq(
      (1L, 9L, 9L), (2L, 11L, 11L),
      (3L, 19L, 5L), (4L, 21L, 5L),
      (5L, 40L, 40L), (6L, 40L, 51L),
      (7L, 70L, 70L), (8L, 76L, 78L)
    ).toDF("id", "x", "y")
    for (parts <- Seq(1, 4)) {
      val got = Layout.spatialJoinDf(pts.repartition(parts), r = 10L, topK = 10)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      assert(got.toSeq == Seq(
        (3L, 4L, 4L, 4L),   // dist2 4, n_pairs 4
        (1L, 2L, 8L, 4L),   // corner-straddling pair, found once
        (2L, 3L, 100L, 4L), // (11,11)-(19,5): cross-cell at exactly r²
        (7L, 8L, 100L, 4L)  // same cell at exactly r² — boundary inclusive
      ), s"parts=$parts: ${got.toSeq}")
    }
  }

  test("nnDistance buckets nearest neighbors; isolated points report -1") {
    val spark2 = spark
    import spark2.implicits._
    // (0,0)-(3,4) mutual NN at dist2 25 → bucket 25·10 DIV 100 = 2;
    // (50,50) has no neighbor within r=10 → bucket −1. The NN pair
    // straddles cells (0,0) and (0,0)… use (9,1)-(12,5): dist2 = 25,
    // cells (0,0) vs (1,0) — cross-cell NN exercised
    val pts = Seq((1L, 9L, 1L), (2L, 12L, 5L), (3L, 50L, 50L))
      .toDF("id", "x", "y")
    val got = Layout.nnDistanceDf(pts, r = 10L).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((-1, 1L), (2, 2L)), s"$got")
  }
}
