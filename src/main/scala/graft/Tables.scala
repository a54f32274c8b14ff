package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet star schema (TESTDATA.md).
  *
  * All graft operators read these tables lazily; filters/projections applied
  * downstream reach the parquet scan via Catalyst pushdown, so a query that
  * touches 2 columns of `lineitem` only reads 2 column chunks — the property
  * that keeps a 100 TB scan bounded by the columns actually used.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that should always be broadcast in joins. */
  val broadcastable: Set[String] = Set("region", "nation", "supplier", "part", "customer")

  /** Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) columns (the
    * testdata generator's `timestamp[us]` arrow type) read as
    * TIMESTAMP_NTZ in Spark 4, which `unix_micros`/datetime arithmetic
    * reject. Every graft session pins spark.sql.session.timeZone=UTC, so
    * casting NTZ→TIMESTAMP is instant-exact (wall time == UTC instant,
    * exactly how DuckDB loads the same column into its naive µs
    * TIMESTAMP) — normalize at the single load chokepoint. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The NTZ→TIMESTAMP cast below is instant-exact ONLY under a UTC
    // session zone; an entrypoint that forgot the pin would silently
    // shift every timestamp. Fail loud here, at the single chokepoint.
    // Any fixed zero-offset zone id qualifies (UTC, Etc/UTC, GMT, Z …).
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(java.time.ZoneId.of(tz).getRules.isFixedOffset &&
        java.time.ZoneId.of(tz).getRules.getOffset(java.time.Instant.EPOCH)
          .getTotalSeconds == 0,
      s"Tables.load requires a UTC session timeZone, got '$tz' " +
        "(set spark.sql.session.timeZone=UTC in the SparkSession builder)")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * raw long (legacy.parquet.nanosAsLong — set in every session builder).
    * Floor to microseconds exactly as DuckDB does when loading nanos into
    * its µs TIMESTAMP, so both engines see identical instants. `div`
    * truncates toward zero, so subtract the positive remainder first —
    * integer-exact floor division (pre-1970 instants floor, not truncate). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000L)) div 1000")))
    else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view so `spark.sql` works against a scale dir. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
