package graft.queries

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.SparkEntry

/** Order-sensitivity regression guard (r21 ADVICE): every query that carries
  * its global output order PHYSICALLY — range exchange + in-partition sort
  * surviving projections/aggregates/coalesce(1) instead of a logical trailing
  * Sort — is asserted here against its declared ORDER BY contract, on real
  * testdata, through the same `coalesce(1)` funnel the Verify dump uses. A
  * future operator insertion (a rebalance, a different write path, an AQE
  * behavior change) that breaks the physical-order assumption fails here
  * before it silently fails the driver's hash compare.
  *
  * Uses sf0.01 rather than the smallest SF so multi-row, multi-partition
  * shapes are actually exercised (sf0.001 leaves several outputs at 0–1
  * rows).
  */
class OrderContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** query name → (projection of the row into its ORDER BY key, ascending
    * lexicographic on the projected seq). Descending keys are negated /
    * inverted inside the projection so one comparator covers all.
    */
  private def keyOf(name: String): Row => Seq[Long] = name match {
    case "q10_recent_events" =>
      // ORDER BY ts DESC, event_id ASC
      r => Seq(-r.getAs[java.time.LocalDateTime]("ts").toInstant(java.time.ZoneOffset.UTC).toEpochMilli, r.getAs[Long]("event_id"))
    case "q16_user_activity_decay" =>
      r => Seq(r.getAs[Long]("user_id"), r.getAs[Int]("rn").toLong)
    case "q31_doc_quality" | "q32_lang_id" | "q33_doc_fingerprint" | "q39_token_count" |
        "q35_minhash_signature" =>
      r => Seq(r.getAs[Long]("doc_id"))
    case "q40_embedding_norms" =>
      r => Seq(r.getAs[Long]("vec_id"))
    case "q42_cosine_pairs" =>
      r => Seq(r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
    case "q43_cosine_topk" =>
      r => Seq(r.getAs[Long]("a_id"), r.getAs[Int]("rank").toLong)
    case other => fail(s"no order contract registered for $other")
  }

  private val guarded = Seq(
    "q10_recent_events",
    "q16_user_activity_decay",
    "q31_doc_quality",
    "q32_lang_id",
    "q33_doc_fingerprint",
    "q35_minhash_signature",
    "q39_token_count",
    "q40_embedding_norms",
    "q42_cosine_pairs",
    "q43_cosine_topk",
  )

  for (name <- guarded)
    test(s"$name output arrives in its declared global order through coalesce(1)") {
      val key  = keyOf(name)
      // The exact funnel Verify uses: physical partition order concatenated.
      val rows = SparkEntry.queries(name)(spark, sf).coalesce(1).collect()
      assert(rows.length > 1, s"$name returned ${rows.length} rows at sf0.01 — too few to check order")
      val keys = rows.toSeq.map(key)
      val violations = keys.sliding(2).zipWithIndex.collect {
        case (Seq(a, b), i) if Ordering.Implicits.seqOrdering[Seq, Long].gt(a, b) => (i, a, b)
      }.take(3).toList
      assert(violations.isEmpty, s"$name order violations (index, prev, next): $violations")
    }
}
