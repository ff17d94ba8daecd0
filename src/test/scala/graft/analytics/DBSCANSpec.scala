package graft.analytics

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The DBSCAN contract has two physical paths (driver-local union-find vs
  * distributed hash-min propagation) behind one logical definition; these
  * suites pin (1) the semantics on hand-built geometries and (2) bit-identical
  * agreement between the two paths on real testdata.
  */
class DBSCANSpec extends SparkSpec {

  import spark.implicits._

  private def df(pts: Seq[(Long, Double, Double, Double)]) =
    pts.toDF("id", "x", "y", "w")

  private def run(pts: Seq[(Long, Double, Double, Double)], eps: Double, minW: Double, forceDistributed: Boolean) =
    DBSCAN
      .cluster(df(pts), epsKm = eps, minWeight = minW, cellDeg = 4.0,
        smallThreshold = if (forceDistributed) 0 else DBSCAN.SmallInputThreshold)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  for (distributed <- Seq(false, true)) {
    val tag = if (distributed) "distributed" else "local"

    test(s"$tag: two separated clusters, min-id labels, noise = -1") {
      // Two tight triads ~2000 km apart, one lone far-away point. At the
      // equator 1° ≈ 111 km, so eps=300 km links points ≤ ~2.7° apart.
      val pts = Seq(
        (10L, 0.0, 0.0, 1.0), (11L, 1.0, 0.0, 1.0), (12L, 0.0, 1.0, 1.0),
        (20L, 20.0, 0.0, 1.0), (21L, 21.0, 0.0, 1.0), (22L, 20.0, 1.0, 1.0),
        (30L, -40.0, -40.0, 1.0),
      )
      val labels = run(pts, eps = 300.0, minW = 3.0, forceDistributed = distributed)
      assert(labels(10L) == 10L && labels(11L) == 10L && labels(12L) == 10L)
      assert(labels(20L) == 20L && labels(21L) == 20L && labels(22L) == 20L)
      assert(labels(30L) == -1L)
    }

    test(s"$tag: weighted core condition counts neighbor weights") {
      // Pair of points, each w=1.5: neighborhood weight 3.0 meets minW=3.0 →
      // both core, one cluster. With w=1.4 (sum 2.8 < 3.0) → all noise.
      val core = run(Seq((1L, 0.0, 0.0, 1.5), (2L, 0.5, 0.0, 1.5)), 300.0, 3.0, distributed)
      assert(core == Map(1L -> 1L, 2L -> 1L))
      val noise = run(Seq((1L, 0.0, 0.0, 1.4), (2L, 0.5, 0.0, 1.4)), 300.0, 3.0, distributed)
      assert(noise == Map(1L -> -1L, 2L -> -1L))
    }

    test(s"$tag: border point takes min core neighbor label") {
      // Heavy core at origin; light satellite inside eps of the core but not
      // itself core (its neighborhood weight 4.0+0.1 ≥ 3.0 — make it lighter
      // zone: use minW high enough that only the heavy point is core).
      val pts    = Seq((1L, 0.0, 0.0, 5.0), (2L, 2.0, 0.0, 0.1))
      val labels = run(pts, eps = 300.0, minW = 5.05, forceDistributed = distributed)
      assert(labels(1L) == 1L) // w(5.0)+nbr(0.1) = 5.1 ≥ 5.05 → core
      assert(labels(2L) == 1L) // 0.1+5.0 = 5.1 ≥ 5.05 — also core, same component
      val labels2 = run(pts :+ (3L, -40.0, 40.0, 0.2), eps = 300.0, minW = 5.05, forceDistributed = distributed)
      assert(labels2(3L) == -1L)
    }

    test(s"$tag: chain across cell boundaries stays one component") {
      // 12 points spaced 2.5° along the equator: consecutive ones are inside
      // eps=300 km, the chain spans many 4° cells — exercises 3×3 probing and
      // (distributed) multi-round pointer jumping.
      val pts    = (0 until 12).map(i => (100L + i, i * 2.5, 0.0, 1.0))
      val labels = run(pts, eps = 300.0, minW = 2.0, forceDistributed = distributed)
      assert(labels.values.toSet == Set(100L))
    }
  }

  test("local and distributed paths agree bit-for-bit on events testdata") {
    // sf0.001 has zero events inside the q25 bbox; sf0.01 has ~139.
    val pts = graft.core.Tables
      .events(spark, "/root/testdata/sf0.01")
      .withColumn("x", col("value") % 360.0 - 180.0)
      .withColumn("y", (col("user_id") % 180 - 90).cast("double"))
      .filter(col("x") >= -30.0 && col("x") <= 30.0 && col("y") >= -30.0 && col("y") <= 30.0)
      .select(col("event_id").as("id"), col("x"), col("y"), lit(1.0).as("w"))
    val local = DBSCAN.cluster(pts, 300.0, 3.0, 4.0).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val dist = DBSCAN
      .cluster(pts, 300.0, 3.0, 4.0, smallThreshold = 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    assert(local.nonEmpty)
    assert(local == dist)
  }
}
