package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join sends every row of a hot key to ONE reducer; one
  * pathological key (null-ish ids, default values, celebrity users) can
  * stall a 1000-executor job on a single task. Salting splits each hot
  * key into `saltFactor` sub-keys: the big side gets a DETERMINISTIC
  * salt derived from a discriminator column (no `rand()` — results must
  * be reproducible and retry-safe), the small side is replicated
  * `saltFactor`× with every salt value, and the join key becomes
  * (key, salt). Result set is provably identical to the plain join;
  * reducer load for a hot key drops by `saltFactor`.
  *
  * AQE's skew-join splitting handles sort-merge cases adaptively; this
  * operator is for when the skew is known and the plan must be fixed
  * up-front (or the join is not a sort-merge join).
  */
object SkewJoin {

  /** Inner equi-join of `big ⋈ small` on `key`, salted `saltFactor`
    * ways. `discriminator` spreads the big side's hot keys (pick a
    * high-cardinality column, e.g. the fact table's line id). */
  def saltedInner(big: DataFrame, small: DataFrame, key: String,
      discriminator: Column, saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0)
    val b = big.withColumn("__salt", pmod(hash(discriminator), lit(saltFactor)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
