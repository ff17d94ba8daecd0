package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QuerySpec, Tables}

/** Similarity search over the `embeddings` table (`vec_id, embedding float[64],
  * label`) — the ANN / near-dup-by-cosine leg of the training-data pipeline.
  *
  * Design for scale: one side of every pairwise computation is broadcast
  * (embeddings compress to KBs per thousand vectors), so the quadratic part is
  * a BroadcastNestedLoopJoin that parallelizes over the streamed side's
  * partitions with zero shuffle. The brute-force top-k here is the correctness
  * baseline; the LSH/IVF bucketed variant (bucket on coarse quantization, join
  * within bucket) is the 100 TB path and shares these column expressions.
  *
  * All float math is widened to double *before* any arithmetic on both the
  * Spark and DuckDB sides so the fold order is the only divergence — which the
  * output rounding (or id-only outputs) absorbs.
  */
object SimilarityOps {

  private def vec: Column = transform(col("embedding"), x => x.cast("double"))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** vec_id, v (double[]), norm — shared prep for every query below. */
  private def normed(s: SparkSession, d: String): DataFrame =
    Tables
      .embeddings(s, d)
      .select(col("vec_id"), col("label"), vec.as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  private val normedSqlCte =
    """normed AS (
      |  SELECT vec_id, label,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      |         sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
      |                               list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings)""".stripMargin

  /** L2 norms + dimensionality — the scalar warm-up that pins the float→double
    * widening contract between engine and oracle.
    */
  val qNorms: QuerySpec = QuerySpec(
    "q40_embedding_norms",
    (s, d) =>
      normed(s, d)
        .select(
          col("vec_id"),
          size(col("v")).cast("long").as("dim"),
          round(col("nrm"), 4).as("l2_norm"),
        )
        .orderBy(col("vec_id")),
    Some(s"""
      WITH $normedSqlCte
      SELECT vec_id, CAST(len(v) AS BIGINT) AS dim, round(nrm, 4) AS l2_norm
      FROM normed
      ORDER BY vec_id
    """.stripMargin.trim),
  )

  /** Per-label centroid (A2's vector generalization): position-exploded mean
    * per dimension, then the centroid's L2 norm. Explode → (label, pos) agg is
    * one shuffle keyed by (label, dim) — 640 keys here, and still tiny at any
    * scale.
    */
  val qLabelCentroids: QuerySpec = QuerySpec(
    "q41_label_centroids",
    (s, d) => {
      val exploded = normed(s, d)
        .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      val dimMeans = exploded
        .groupBy(col("label"), col("pos"))
        .agg(avg(col("x")).as("m"))
      val nVecs = normed(s, d).groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
      dimMeans
        .groupBy(col("label"))
        .agg(round(sqrt(sum(col("m") * col("m"))), 4).as("centroid_norm"))
        .join(nVecs, "label")
        .select(col("label"), col("n_vecs"), col("centroid_norm"))
        .orderBy(col("label"))
    },
    Some(s"""
      WITH $normedSqlCte,
      exploded AS (
        SELECT label, i AS pos, v[i] AS x
        FROM normed, unnest(range(1, len(v) + 1)) AS u(i)),
      dim_means AS (
        SELECT label, pos, avg(x) AS m FROM exploded GROUP BY label, pos),
      n_vecs AS (SELECT label, count(*) AS n_vecs FROM normed GROUP BY label)
      SELECT d.label, n.n_vecs, round(sqrt(sum(d.m * d.m)), 4) AS centroid_norm
      FROM dim_means d JOIN n_vecs n ON d.label = n.label
      GROUP BY d.label, n.n_vecs
      ORDER BY d.label
    """.stripMargin.trim),
  )

  /** Cosine near-dup pairs above 0.4 — id-only output so no float crosses the
    * hash compare; the threshold sits far from the data's sim distribution
    * tail (max ≈ 0.51 at sf0.01, measured) only in the sense that pairs are
    * sparse; boundary ties are broken by >= on both sides.
    */
  val qCosinePairs: QuerySpec = QuerySpec(
    "q42_cosine_pairs",
    (s, d) => {
      val a = normed(s, d).select(col("vec_id").as("a_id"), col("v").as("va"), col("nrm").as("na"))
      val b = normed(s, d).select(col("vec_id").as("b_id"), col("v").as("vb"), col("nrm").as("nb"))
      a.join(broadcast(b), col("a_id") < col("b_id"))
        .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .filter(col("sim") >= 0.4)
        .select(col("a_id"), col("b_id"))
        .orderBy(col("a_id"), col("b_id"))
    },
    Some(s"""
      WITH $normedSqlCte
      SELECT a.vec_id AS a_id, b.vec_id AS b_id
      FROM normed a JOIN normed b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
      ORDER BY a_id, b_id
    """.stripMargin.trim),
  )

  /** Brute-force cosine top-3 neighbors per vector (the ANN correctness
    * baseline). Output is (vec_id, rank, neighbor) — ids only. rank ties are
    * impossible for continuous data; ordering ties break on neighbor id.
    */
  val qCosineTopK: QuerySpec = QuerySpec(
    "q43_cosine_topk",
    (s, d) => {
      val a = normed(s, d).select(col("vec_id").as("a_id"), col("v").as("va"), col("nrm").as("na"))
      val b = normed(s, d).select(col("vec_id").as("b_id"), col("v").as("vb"), col("nrm").as("nb"))
      val sims = a
        .join(broadcast(b), col("a_id") =!= col("b_id"))
        .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      sims
        .withColumn(
          "rank",
          row_number().over(
            Window.partitionBy(col("a_id")).orderBy(col("sim").desc, col("b_id")),
          ),
        )
        .filter(col("rank") <= 3)
        .select(col("a_id"), col("rank"), col("b_id").as("neighbor_id"))
        .orderBy(col("a_id"), col("rank"))
    },
    Some(s"""
      WITH $normedSqlCte,
      sims AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
        FROM normed a JOIN normed b ON a.vec_id <> b.vec_id),
      ranked AS (
        SELECT a_id, b_id,
               row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rank
        FROM sims)
      SELECT a_id, rank, b_id AS neighbor_id
      FROM ranked WHERE rank <= 3
      ORDER BY a_id, rank
    """.stripMargin.trim),
  )

  val all: Seq[QuerySpec] = Seq(qNorms, qLabelCentroids, qCosinePairs, qCosineTopK)
}
