package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Cross-engine stable hashing and text shingling.
  *
  * Every sketch operator (minhash, simhash, fingerprint, LSH planes) must
  * produce bit-identical values in Spark and in the DuckDB oracle. md5 is
  * the one hash both engines share bit-for-bit, so the engine's stable
  * 60-bit hash is "first 15 hex chars of md5, read as an unsigned int":
  * Spark `conv(substr(md5(x),1,15),16,10)` ≡ DuckDB
  * `('0x'||substr(md5(x),1,15))::BIGINT`. 60 bits keeps the value inside
  * a positive signed long in both engines (no sign/overflow edge cases).
  */
object Hashing {

  /** Stable 60-bit hash of a string column (see object doc). Backed by
    * the native [[StableHash60]] expression; [[hash60Composed]] is the
    * equivalent built-in chain kept for parity testing. */
  def hash60(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      StableHash60(org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** Built-in-only formulation (what the DuckDB oracle computes). */
  def hash60Composed(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant: independent hash family member `seed`. */
  def hash60(seed: Column, c: Column): Column =
    hash60(concat(seed.cast("string"), lit(":"), c))

  /** Same 60-bit hash computed driver-side (for deterministic constants
    * like LSH hyperplane coefficients). */
  def hash60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Whitespace tokens (reference tokenization for all text ops). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Distinct 3-word shingles of a token array (native [[Shingles3]];
    * empty for < 3 tokens, mirroring DuckDB `range(1, len-1)`). */
  def shingles3(tk: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Shingles3(org.apache.spark.sql.GraftColumnBridge.expression(tk)))

  /** Non-distinct word bigrams of a token array, position order (native
    * [[Bigrams2]]; empty for < 2 tokens, mirroring DuckDB
    * `range(1, len)`). */
  def bigrams2(tk: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      Bigrams2(org.apache.spark.sql.GraftColumnBridge.expression(tk)))

  /** Built-in-only shingle formulation (parity testing only — the HOF
    * chain re-evaluates `tk` per element when `tk` is not a bare
    * attribute, so never use it in an operator). */
  def shingles3Composed(tk: Column): Column =
    when(size(tk) >= 3,
      array_distinct(transform(sequence(lit(1), size(tk) - 2), i =>
        concat_ws(" ",
          element_at(tk, i), element_at(tk, i + 1), element_at(tk, i + 2)))))
      .otherwise(array().cast("array<string>"))
}
