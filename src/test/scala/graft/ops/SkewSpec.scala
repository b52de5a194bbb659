package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew handling: a hot key that holds most of the fact side gets
  * its shuffle partition split at runtime (OptimizeSkewedJoin) —
  * the no-code-change path that complements Joins.saltedJoin.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits the skewed partition in a sort-merge join") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")
    val priors = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 80% of the fact rows share key 0; ~100B payload each.
      val fact = spark.range(300000).select(
        when(col("id") < 240000, 0L).otherwise(col("id")).as("k"),
        lpad(col("id").cast("string"), 100, "x").as("payload"))
      val dim = spark.range(1000).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("name"))
      val j = fact.join(dim, "k")
      // Execute j's OWN QueryExecution (count() would plan a separate
      // aggregate query and leave this one un-finalized).
      assert(j.collect().length == 240000) // only the hot key matches
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(2000))
    } finally priors.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
