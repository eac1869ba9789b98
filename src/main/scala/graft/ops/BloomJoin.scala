package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.ShiftLeft
import org.apache.spark.sql.functions._


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
  * deterministic seeded-xxhash64 hash family, so plans — and specs — can
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

  /** Hash family: seeded xxhash64 (native, codegen'd, no string cast).
    * Bloom positions are engine-internal — the oracle compares the JOIN
    * RESULT, which false positives can't change — so the cross-engine
    * md5 hash (`Hashing.hash60`) isn't required and its ~4× per-row cost is
    * avoided. */
  private def bitPositions(key: Column, numBits: Int, numHashes: Int) =
    (0 until numHashes).map(i => pmod(xxhash64(lit(i), key), lit(numBits.toLong)))

  /** SPARSE bitmap cells (`__w`: word index, `__bits`: that word's set
    * bits) of the small side's `keyCol` values. One map-side-combined
    * aggregation: the shuffle carries set WORDS (≤ numBits/64 per
    * partition), not keys — and sketches of disjoint inputs merge by
    * unioning cells and re-`bit_or`ing. */
  def bloomBuild(small: DataFrame, keyCol: String,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    require(numBits % 64 == 0 && numBits > 0 && numHashes >= 1)
    small
      .select(explode(array(
        bitPositions(col(keyCol), numBits, numHashes): _*)).as("__p"))
      .select(shiftright(col("__p"), 6).as("__w"),
        shl(lit(1L), (col("__p") % 64).cast("int")).as("__m"))
      .groupBy(col("__w")).agg(expr("bit_or(__m)").as("__bits"))
  }

  /** The built bitmap as a driver-side dense word array. The collect is
    * a FIXED-SIZE materialization (≤ numBits/64 cells — data-
    * independent), the same shape as Spark's own `InjectRuntimeFilter`
    * evaluating its bloom subquery driver-side: a bounded sketch
    * crossing to the driver, never data. Densification happens HERE, in
    * plain Scala — building the dense array in-plan with
    * `element_at(map_from_entries(...))` is an interpreted linear-scan
    * map probe per position, O(words × cells) on one driver row
    * (measured: ~10 s at 2²⁰ bits). */
  def bloomWords(small: DataFrame, keyCol: String,
      numBits: Int = 1 << 20, numHashes: Int = 5): Array[Long] = {
    val words = new Array[Long](numBits / 64)
    bloomBuild(small, keyCol, numBits, numHashes).collect()
      .foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** Membership test of `key` against the bitmap as a LITERAL word
    * array: the filter sits directly on the big side's scan inside
    * whole-stage codegen. (A broadcast-and-crossJoin formulation puts
    * the probe in a BroadcastNestedLoopJoin condition, which Spark
    * evaluates INTERPRETED — measured 20× slower at 2²⁰ bits.)
    * Unrolled over the (plan-time constant) hash count. */
  def mightContain(key: Column, words: Array[Long], numBits: Int,
      numHashes: Int): Column =
    bitPositions(key, numBits, numHashes).map { p =>
      element_at(typedLit(words), shiftright(p, 6).cast("int") + 1)
        .bitwiseAND(shl(lit(1L), (p % 64).cast("int"))) =!= 0L
    }.reduce(_ && _)

  /** Inner equi-join of `big` ⋈ `small` on `keyCol`, with `big`
    * Bloom-pruned before the join. Result rows are exactly the plain
    * join's; only the amount of `big` that reaches the shuffle changes. */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, keyCol: String,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val words = bloomWords(small, keyCol, numBits, numHashes)
    big.filter(mightContain(col(keyCol), words, numBits, numHashes))
      .join(small, keyCol)
  }
}
