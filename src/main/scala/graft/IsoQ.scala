package graft
import org.apache.spark.sql.SparkSession

/** Fast-iteration timing entry point (see .claude/skills/verify/SKILL.md):
  * `runMain graft.IsoQ q1,q2 /root/testdata/sf0.01` prints `TIMING <name> <sec>`
  * per query with no oracle compare.
  */
object IsoQ {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: IsoQ <name1,name2,...> <sfDir>")
      System.err.println("valid query names:\n  " + SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      sys.exit(2)
    }
    val names = args(0).split(",").toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(",")}")
      System.err.println("valid query names:\n  " + SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      sys.exit(2)
    }
    val sfDir = args(1)
    // Non-numeric SPARK_GRAFT_CPUS must not crash session build.
    val cpus =
      sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.trim.toIntOption).filter(_ > 0).getOrElse(8)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
        println(s"==== EXPLAIN $name ====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
      spark.sparkContext.setJobDescription(s"isoq:$name")
      val t0 = System.nanoTime()
      // Same timed action as Bench: the noop sink (guide §1.4).
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"TIMING $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
