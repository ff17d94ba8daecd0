package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs this per-round at sf0.1 → BENCH_r{N}.json.
  *
  * Harness rules (judge round-1 findings):
  *  - deterministic run order: queries sorted by name, so per-query timings are
  *    comparable across rounds and GC pressure from one heavy query lands on
  *    the same neighbor every time;
  *  - a real materialization per query: `foreachPartition(drain)` forces every
  *    projected column through the full plan (a bare `.count()` lets Catalyst
  *    prune projection-only expressions — md5s, haversines — out of the
  *    measurement entirely);
  *  - the result JSON is printed on its own line *and* written to
  *    `BENCH_LOCAL.json` (env `SPARK_GRAFT_BENCH_OUT` overrides), because sbt
  *    prefixes stdout with [info] and the driver's JSON parse failed on it in
  *    round 1 (`"parsed": null`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // NOTE: driver heap for local mode comes from build.sbt javaOptions
      // (SPARK_DRIVER_MEM env) — setting spark.driver.memory here would be a
      // no-op once the JVM is already running.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Median-of-3 per query: single-shot timings on a shared machine have been
    // noise-dominated (same code swung 4 s → 352 s between rounds); the median
    // of three back-to-back runs is robust to a single contention spike while
    // keeping total bench wall-clock bounded. Override with SPARK_GRAFT_BENCH_REPS.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try {
          // Materialize every row of every column on the executors; nothing is
          // collected to the driver, nothing is pruned.
          fn(spark, sfDir).foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
            while (it.hasNext) it.next()
            ()
          }
        } catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median = times(times.length / 2)
      name -> BigDecimal(median).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    val qs    = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = BigDecimal(results.map(_._2).sum).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val json  = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Own line with no prefix risk + a file copy for the driver.
    println()
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try Files.writeString(Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: $e") }
    spark.stop()
  }
}
