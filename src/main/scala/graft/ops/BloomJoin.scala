package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.ShiftLeft
import org.apache.spark.sql.functions._

import graft.functions.Hashing.hash60

/** Bloom-pruned equi-join: build a Bloom filter over the small side's
  * join keys with plain aggregates, broadcast the (fixed-size) bitmap,
  * and drop big-side rows that cannot match BEFORE the join's shuffle.
  *
  * At lake scale this is the difference between shuffling the full fact
  * table and shuffling only the ~selectivity fraction that can join: the
  * filter is a per-row codegen'd expression against a broadcast array —
  * no extra shuffle, no per-key state, and the bitmap is kilobytes
  * however large the fact is. False positives only (a set bit can lie,
  * an unset bit cannot), so the join that follows still decides
  * membership exactly — the result is IDENTICAL to the plain join, which
  * is what makes the operator oracle-gateable.
  *
  * Spark's optimizer injects a similar runtime bloom under AQE
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) when statistics
  * justify it; this operator is the explicit, always-on form with a
  * deterministic (md5-derived) hash family, so plans — and specs — can
  * rely on the prune being present.
  *
  * Sizing: false-positive rate ≈ (1 − e^(−kn/m))^k for n keys, m =
  * `numBits`, k = `numHashes`; the defaults (2²⁰ bits, 5 hashes) hold
  * ~1% up to n ≈ 10⁵ keys. An undersized filter only costs prune
  * efficiency, never correctness.
  */
object BloomJoin {

  /** shiftleft with a COLUMN shift amount (the public `shiftleft` only
    * takes a literal Int). */
  private def shl(v: Column, by: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(ShiftLeft(
      org.apache.spark.sql.GraftColumnBridge.expression(v),
      org.apache.spark.sql.GraftColumnBridge.expression(by)))

  private def bitPositions(key: Column, numBits: Int, numHashes: Int) =
    (0 until numHashes).map(i => hash60(lit(i), key.cast("string")) % numBits)

  /** One-row DataFrame holding the dense bitmap (`__bloom`: numBits/64
    * longs) of the small side's `keyCol` values. One map-side-combined
    * aggregation: the shuffle carries set WORDS (≤ numBits/64 per
    * partition), not keys. */
  def bloomBuild(small: DataFrame, keyCol: String,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    require(numBits % 64 == 0 && numBits > 0 && numHashes >= 1)
    val nWords = numBits / 64
    small
      .select(explode(array(
        bitPositions(col(keyCol), numBits, numHashes): _*)).as("__p"))
      .select(shiftright(col("__p"), 6).as("__w"),
        shl(lit(1L), (col("__p") % 64).cast("int")).as("__m"))
      .groupBy(col("__w")).agg(expr("bit_or(__m)").as("__bits"))
      .agg(map_from_entries(collect_list(struct(col("__w"), col("__bits"))))
        .as("__wm"))
      .select(transform(sequence(lit(0), lit(nWords - 1)),
        w => coalesce(element_at(col("__wm"), w.cast("long")), lit(0L)))
        .as("__bloom"))
  }

  /** Membership test of `key` against the broadcast `__bloom` column:
    * every hash's bit must be set. Unrolled over the (plan-time
    * constant) hash count — stays inside whole-stage codegen. */
  private def mightContain(key: Column, numBits: Int,
      numHashes: Int): Column =
    bitPositions(key, numBits, numHashes).map { p =>
      element_at(col("__bloom"), shiftright(p, 6).cast("int") + 1)
        .bitwiseAND(shl(lit(1L), (p % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)

  /** Inner equi-join of `big` ⋈ `small` on `keyCol`, with `big`
    * Bloom-pruned before the join. Result rows are exactly the plain
    * join's; only the amount of `big` that reaches the shuffle changes. */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, keyCol: String,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame =
    big.crossJoin(broadcast(bloomBuild(small, keyCol, numBits, numHashes)))
      .filter(mightContain(col(keyCol), numBits, numHashes))
      .drop("__bloom")
      .join(small, keyCol)
}
