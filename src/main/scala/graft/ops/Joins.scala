package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for skew at scale.
  *
  * AQE's skew-join handles most cases by splitting oversized
  * partitions, but it only works for sort-merge joins after a
  * shuffle. `saltedJoin` is the explicit fallback for pathological
  * hot keys (one key = 30% of a 100 TB fact table): the fact side
  * gets a random-ish salt appended to the key, the dimension side is
  * replicated `buckets` times, and the join key becomes (key, salt) —
  * spreading one hot key over `buckets` reducers.
  */
object Joins {

  /** Inner equi-join of `fact` (large, possibly skewed) with `dim`
    * (replicable) on `key`, with the hot-key load spread over
    * `buckets` partitions per key.
    *
    * The salt is derived from a hash of the fact row's other columns
    * (deterministic — keeps retries/speculation consistent), not from
    * rand(), so results are reproducible.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String, buckets: Int,
      saltSource: Column): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(buckets)).cast("int"))
    val replicated = dim
      .withColumn("_salt",
        explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
