package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (see /root/repo/TESTDATA.md).
  *
  * Every query receives the scale-factor directory at call time so the same plan
  * runs unchanged from sf0.001 smoke to a 100 TB lake — the parquet scan is the
  * only scale-dependent node and Catalyst handles pushdown/pruning per scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; with `spark.sql.legacy.parquet.nanosAsLong` the
    * column arrives as nano-epoch Long and is converted losslessly here (driver
    * data is µs-clean — every value has ns%1000==0).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** The session's shuffle parallelism, for EXPLICIT repartition counts.
    *
    * A `repartition`/`repartitionByRange` without a count lets AQE coalesce
    * the exchange by byte size — and on small inputs that is ONE partition,
    * which serializes every projection/computation sitting above the
    * exchange (measured in r22: q35's interpreted-HOF MinHash signature and
    * the O(n²)/kernel stages of q42/q43/q23/q24 all collapsed to a single
    * task this way). Pinning the session's configured parallelism is a
    * no-op at real scale — a large shuffle would not have been coalesced
    * below it anyway — and keeps compute-heavy stages wide at bench scale.
    * Scale-adaptive by construction: the bench contract sets this conf to
    * `$SPARK_GRAFT_CPUS`, production sets cluster parallelism (default 200).
    */
  def shufflePartitions(s: SparkSession): Int =
    s.conf.getOption("spark.sql.shuffle.partitions").flatMap(_.toIntOption).getOrElse(200)
}

/** One externally-verifiable query: a Spark plan plus (optionally) equivalent
  * ANSI SQL the driver runs in DuckDB over the same parquet. Column names and
  * row values must agree bit-for-bit after the driver's name-sorted hash, so
  * every double is rounded identically on both sides and every result carries
  * a total ORDER BY on deterministic keys.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)
