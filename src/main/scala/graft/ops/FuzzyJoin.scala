package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join over a corpus vocabulary
  * (typo/variant clustering — the vocab-normalization pass of a text
  * pipeline).
  *
  * Never O(|vocab|²): Levenshtein distance ≥ length difference, so a
  * pair within `maxDist` must sit within `maxDist` of each other in
  * length. One side is replicated (2·maxDist+1)× onto its neighboring
  * length buckets and the join is an EQUI-join on the bucket — each
  * true pair is generated exactly once (its single length difference
  * picks the one matching bucket), candidates are bounded by
  * per-length-bucket co-occupancy, and only candidates pay the
  * `levenshtein` evaluation. Sharper prefixes (first-char buckets,
  * q-gram filters) slot into the same shape for tighter vocabularies.
  *
  * Vocabulary extraction itself is a map-side-combined distinct over
  * token explode — the corpus shuffles only its distinct tokens.
  */
object FuzzyJoin {

  /** Distinct-token pairs with edit distance ≤ `maxDist` (t_a < t_b). */
  def vocabPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxDist: Int = 2): DataFrame = {
    val vocab = docs
      .select(explode(graft.functions.Hashing.tokens(col(textCol))).as("t"))
      .filter(length(col("t")) > 0)
      .distinct()
    val a = vocab.select(col("t").as("t_a"), length(col("t")).as("lb"))
    val b = vocab.select(col("t").as("t_b"), length(col("t")).as("len_b"))
      .select(col("t_b"), explode(sequence(col("len_b") - maxDist,
        col("len_b") + maxDist)).as("lb"))
    a.join(b, Seq("lb"))
      .filter(col("t_a") < col("t_b"))
      .withColumn("dist", levenshtein(col("t_a"), col("t_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select("t_a", "t_b", "dist")
  }
}
