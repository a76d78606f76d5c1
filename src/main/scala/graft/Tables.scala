package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries take `(spark, sfDir)` and read parquet lazily so Catalyst
  * can push filters/projections into the scan. At cluster scale the same
  * code reads a partitioned table directory; nothing here assumes local
  * mode.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The driver's parquet stores naive (not-UTC-adjusted) timestamps. Our
    * own sessions read them as TIMESTAMP directly (inferTimestampNTZ=false,
    * session tz UTC — byte-identical to what the DuckDB oracle sees). A
    * foreign session (the driver's smoke check passes its own) may infer
    * TIMESTAMP_NTZ instead; normalize so every downstream operator sees
    * one timestamp type. No-op (no extra Project) when nothing is NTZ.
    *
    * CONTRACT: the NTZ→TIMESTAMP cast reinterprets naive micros in the
    * SESSION timezone, so a foreign session must run with
    * `spark.sql.session.timeZone=UTC` (as every session this library
    * builds does) or instants shift relative to what the UTC-session
    * oracle reads. Values, not just rendering — set UTC.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val ntz = raw.schema.fields.filter(_.dataType == TimestampNTZType).map(_.name)
    if (ntz.isEmpty) raw
    else ntz.foldLeft(raw)((df, c) => df.withColumn(c, col(c).cast(TimestampType)))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark has no native
    * type for. Read nanos as long and truncate to microsecond timestamps
    * (matching what the DuckDB oracle does when it reads the same file).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer division — a double roundtrip would lose precision at
        // ~1.7e18 nanos (doubles carry 53 bits)
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
