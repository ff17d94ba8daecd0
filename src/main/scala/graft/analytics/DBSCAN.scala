package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** Weighted haversine DBSCAN — the reference's clustering operator
  * (`/root/reference/thisishappening/utils/cluster_utils.py:12-57`: sklearn
  * DBSCAN, `metric=haversine`, `sample_weight`, eps sweep until ≥ N clusters).
  *
  * Distributed shape (100 TB design, SURVEY §2.10 option b):
  *  1. bucket points into eps-sized grid cells; each point probes its 3×3
  *     neighborhood via an EQUI-join on the cell key (the probe side explodes
  *     to 9 cells) — a hash-partitioned shuffle join, never a nested loop;
  *  2. core points = Σ weight of eps-neighbors (self included) ≥ minWeight —
  *     sklearn's `sample_weight` core condition (A10);
  *  3. clusters = connected components of the core-core eps graph, via
  *     iterative hash-min label propagation (each round one shuffle join;
  *     `localCheckpoint` truncates lineage). Labels are the component's min
  *     point id — fully deterministic;
  *  4. border points join the minimum-labelled core neighbor. (sklearn assigns
  *     border points to the *first* core that claims them — visit-order
  *     dependent; we fix the deterministic variant and document it.)
  *
  * Noise keeps label −1, like sklearn.
  */
object DBSCAN {

  /** @param points  columns `id` (long), `x` (lon deg), `y` (lat deg), `w`
    * @param epsKm   neighborhood radius (haversine, km)
    * @param minWeight weighted core threshold (sklearn `min_samples` with weights)
    * @param cellDeg bucketing cell size in degrees — must be ≥ eps in degrees
    *                at the data's latitudes for 3×3 probing to be exhaustive
    * @return `id, cluster_label` — label = min id in cluster, −1 for noise
    */
  def cluster(
      points: DataFrame,
      epsKm: Double,
      minWeight: Double,
      cellDeg: Double,
      maxIter: Int = 50,
  ): DataFrame = {
    val p = points
      .withColumn("cx", floor(col("x") / lit(cellDeg)).cast("long"))
      .withColumn("cy", floor(col("y") / lit(cellDeg)).cast("long"))
      .cache()

    // Probe side: each point owns 9 candidate cells → equi-join on the cell.
    val probes = p
      .select(col("id").as("a"), col("x").as("ax"), col("y").as("ay"), col("cx"), col("cy"))
      .withColumn("dxy", explode(array((for {
        dx <- -1 to 1; dy <- -1 to 1
      } yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)))
      .select(
        col("a"),
        col("ax"),
        col("ay"),
        (col("cx") + col("dxy.dx")).as("jcx"),
        (col("cy") + col("dxy.dy")).as("jcy"),
      )
    val build = p.select(
      col("id").as("b"),
      col("x").as("bx"),
      col("y").as("by"),
      col("w").as("bw"),
      col("cx").as("jcx"),
      col("cy").as("jcy"),
    )
    val edges = probes
      .join(build, Seq("jcx", "jcy"))
      .filter(
        col("a") =!= col("b") &&
          Geo.haversineKm(col("ax"), col("ay"), col("bx"), col("by")) <= epsKm,
      )
      .select(col("a"), col("b"), col("bw"))
      .cache()

    // Weighted core condition: own weight + Σ neighbor weights ≥ minWeight.
    val nbrW = edges.groupBy(col("a").as("nid")).agg(sum(col("bw")).as("nw"))
    val cores = p
      .join(nbrW, col("id") === col("nid"), "left")
      .filter(col("w") + coalesce(col("nw"), lit(0.0)) >= minWeight)
      .select(col("id"))
      .cache()

    val coreEdges = edges
      .join(cores.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(cores.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
      .select(col("a"), col("b"))
      .cache()

    // Hash-min connected components with POINTER JUMPING: each round first
    // takes the min over direct neighbors (1 hop), then re-resolves every
    // label through the label of its labelled point (lbl := lbl(lbl)), so the
    // propagation distance doubles per round — convergence in O(log diameter)
    // rounds instead of O(diameter). Round 2 spent 552 s here because a
    // ~50-hop component ran the one-hop loop to maxIter.
    //
    // Labels only decrease, so Σlabel is a convergence measure — one scalar
    // aggregate per round; the checkpoint is LAZY so the aggregate's job is
    // the one that materializes it (one Spark job per round, not two).
    // coalesce(sum, 0): an empty core set (all noise) must not NPE — the loop
    // then converges immediately and every point keeps label −1.
    val tInit = System.nanoTime()
    var labels  = cores.select(col("id"), col("id").as("lbl")).localCheckpoint(true)
    var prevSum = labels.agg(coalesce(sum(col("lbl")), lit(0L))).first().getLong(0)
    if (sys.env.contains("GRAFT_DEBUG"))
      System.err.println(f"[dbscan] init (edges+cores) took ${(System.nanoTime() - tInit) / 1e9}%.2f s")
    var iter    = 0
    var done    = false
    while (!done && iter < maxIter) {
      val nbrMin = coreEdges
        .join(labels, col("a") === col("id"))
        .groupBy(col("b").as("nid"))
        .agg(min(col("lbl")).as("nlbl"))
      val hop = labels
        .join(nbrMin, col("id") === col("nid"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      // Pointer jump: lbl := lbl(lbl). The label always names a core id that
      // exists in `hop`, so the lookup join is total (left join is belt and
      // braces for the empty set).
      val lut = hop.select(col("id").as("lid"), col("lbl").as("llbl"))
      val updated = hop
        .join(lut, col("lbl") === col("lid"), "left")
        .select(col("id"), coalesce(col("llbl"), col("lbl")).as("lbl"))
        .localCheckpoint(false)
      val t0 = System.nanoTime()
      val s = updated.agg(coalesce(sum(col("lbl")), lit(0L))).first().getLong(0)
      if (sys.env.contains("GRAFT_DEBUG"))
        System.err.println(f"[dbscan] iter=$iter sum=$s took ${(System.nanoTime() - t0) / 1e9}%.2f s")
      done = s == prevSum
      prevSum = s
      labels = updated
      iter += 1
    }
    if (!done) {
      // An unconverged labelling is a WRONG clustering (components split),
      // and the oracle's exact closure would diverge silently.
      throw new IllegalStateException(
        s"DBSCAN label propagation did not converge in $maxIter rounds " +
          "(component diameter too large?) — raise maxIter",
      )
    }
    val clab = labels

    // Border points: non-core with ≥1 core neighbor → min core label.
    val border = edges
      .join(cores.withColumnRenamed("id", "a"), Seq("a"), "left_anti")
      .join(clab.withColumnRenamed("id", "b").withColumnRenamed("lbl", "clbl"), Seq("b"))
      .groupBy(col("a").as("bid"))
      .agg(min(col("clbl")).as("blbl"))

    val tOut = System.nanoTime()
    val out = p
      .join(clab.withColumnRenamed("id", "cid"), col("id") === col("cid"), "left")
      .join(border, col("id") === col("bid"), "left")
      .select(
        col("id"),
        coalesce(col("lbl"), col("blbl"), lit(-1L)).as("cluster_label"),
      )
      // Materialize before unpersisting the inputs it depends on: the cached
      // p/edges/cores would otherwise leak executor memory across a 37-query
      // Bench/Verify session (round-2 advisory).
      .localCheckpoint(true)
    if (sys.env.contains("GRAFT_DEBUG"))
      System.err.println(f"[dbscan] border+final took ${(System.nanoTime() - tOut) / 1e9}%.2f s")
    Seq(p, edges, cores, coreEdges).foreach(_.unpersist(false))
    out
  }

  /** Reference eps sweep (`cluster_utils.py:41-42`): try eps values in order,
    * return the first clustering with ≥ `minNClusters` clusters.
    */
  def clusterSweep(
      points: DataFrame,
      epsListKm: Seq[Double],
      minWeight: Double,
      cellDeg: Double,
      minNClusters: Int = 1,
  ): DataFrame = {
    var result: DataFrame = null
    val it                = epsListKm.iterator
    var found             = false
    while (!found && it.hasNext) {
      val eps = it.next()
      result = cluster(points, eps, minWeight, cellDeg)
      val n = result.filter(col("cluster_label") =!= -1L).select(col("cluster_label")).distinct().count()
      found = n >= minNClusters
    }
    result
  }
}
