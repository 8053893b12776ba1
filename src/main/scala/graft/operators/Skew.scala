package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities for the 100 TB tier.
  *
  * AQE's skew-join splitting (on by default) already handles most
  * skew in sort-merge joins at runtime. Salting is the plan-level
  * tool for the case AQE can't fix: a shuffled join where a handful
  * of hot keys dwarf everything (e.g. a near-dup bucket shared by
  * millions of documents, or the `und`-language key in a language
  * roll-up). The big side spreads each hot key over `buckets` salt
  * shards; the small side is replicated `buckets`× so every shard
  * finds its match. Replication cost is |small| × buckets — use for
  * dimension-sized right sides only; genuine fact-fact skew wants
  * AQE or key-isolation instead.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salting the big side into
    * `buckets` shards per key. Semantics identical to
    * `big.join(small, key, "inner")` for 1:N joins (small side unique
    * on the key). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = big.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    val joined = salted.join(replicated,
      salted(key) === replicated(key) && salted("__salt") === replicated("__salt"),
      "inner")
    // drop the helper and the duplicate right-side key column
    joined
      .drop(salted("__salt")).drop(replicated("__salt"))
      .drop(replicated(key))
  }

  /** Per-key frequency of the hottest keys — the diagnostic used to
    * decide whether salting is warranted. */
  def hotKeys(df: DataFrame, key: String, topK: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topK)
}
