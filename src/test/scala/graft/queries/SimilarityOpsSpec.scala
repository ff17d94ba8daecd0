package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType, StructField, StructType}

import graft.SparkSpec

/** Pins q41's single-scan n_vecs invariant (see
  * [[SimilarityOps.labelCentroidsFrom]]): `max` over per-(label, pos) counts
  * equals the per-label vector count only for non-null, non-empty vectors.
  * The second test documents the CHOSEN behavior on data that violates the
  * invariant (ragged/empty vectors undercount), so any future change that
  * relies on q41 for such data trips here first.
  */
class SimilarityOpsSpec extends SparkSpec {

  private val schema = StructType(
    Seq(
      StructField("label", StringType, nullable = false),
      StructField("v", ArrayType(DoubleType), nullable = true),
    ),
  )

  private def centroids(rows: Seq[Row]): Map[String, (Long, Double)] = {
    import scala.jdk.CollectionConverters._
    SimilarityOps
      .labelCentroidsFrom(spark.createDataFrame(rows.asJava, schema))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
  }

  test("fixed-length non-empty vectors: n_vecs is the exact per-label count") {
    val rows = Seq(
      Row("a", Seq(1.0, 0.0)),
      Row("a", Seq(0.0, 1.0)),
      Row("a", Seq(1.0, 1.0)),
      Row("b", Seq(3.0, 4.0)),
    )
    val out = centroids(rows)
    assert(out("a")._1 == 3L)
    // centroid = (2/3, 2/3); norm = sqrt(8/9) rounded to 4 digits
    assert(out("a")._2 == BigDecimal(math.sqrt(8.0 / 9.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out("b") == ((1L, 5.0)))
  }

  test("ragged/empty/null vectors violate the invariant and undercount n_vecs") {
    val rows = Seq(
      Row("a", Seq(1.0, 0.0)),
      Row("a", Seq(0.5)),          // ragged: contributes only pos 0
      Row("a", Seq.empty[Double]), // empty: contributes nothing
      Row("a", null),              // null: contributes nothing
    )
    val out = centroids(rows)
    // 4 vectors under label a, but max per-pos count is 2 (pos 0 sees two
    // rows; pos 1 sees one) — the documented undercount.
    assert(out("a")._1 == 2L)
  }
}
