package graft
import org.apache.spark.sql.SparkSession
object IsoQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args(0).split(",")) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).foreachPartition { it: Iterator[org.apache.spark.sql.Row] => while (it.hasNext) it.next(); () }
      println(f"TIMING $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
