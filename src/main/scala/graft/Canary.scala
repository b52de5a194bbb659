package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-contract canary: a ~5-second preflight that checks every test
  * table's schema and the decoded `events.ts` clock BEFORE the full
  * verification/bench gates run.
  *
  * Motivation (round 9): the driver regenerated `/root/testdata` with
  * `events.ts` as TIMESTAMP(MICROS) where it had been TIMESTAMP(NANOS).
  * The batch path failed loudly at analysis, but the streaming path
  * read µs as ns and silently collapsed 30 days of events into 43
  * minutes — wrong answers, no exception. This canary turns the next
  * such drift into a named, immediate failure:
  *
  *   - every table loads via [[Tables.load]] (so `events` exercises the
  *     adaptive [[Tables.repairEventsTs]] path) and is non-empty;
  *   - column names arrive in the expected order with expected types
  *     (timestamp columns may be TZ or NTZ — both decode the same naive
  *     micros under the pinned UTC session, and the DuckDB oracle
  *     compares naive timestamps);
  *   - `events.ts` decodes to a plausible clock: the min→max span must
  *     cover [1, 365] days and the min must land in [2000, 2100] —
  *     a rescaled clock (ns read as µs, µs read as ns) violates one of
  *     the two immediately at every scale factor.
  *
  * Returns problems as data rather than throwing, so callers choose:
  * the spec asserts emptiness; Verify prints and continues (partial
  * correctness is still worth recording).
  */
object Canary {

  /** Expected (name, acceptable dtypes) per table, post-[[Tables.load]].
    * Timestamp columns accept TZ and NTZ — see class doc.
    */
  private val ts: Seq[DataType] = Seq(TimestampType, TimestampNTZType)
  private def one(t: DataType): Seq[DataType] = Seq(t)

  val expectedSchemas: Map[String, Seq[(String, Seq[DataType])]] = Map(
    "region" -> Seq("r_regionkey" -> one(IntegerType), "r_name" -> one(StringType)),
    "nation" -> Seq("n_nationkey" -> one(IntegerType), "n_name" -> one(StringType),
      "n_regionkey" -> one(IntegerType)),
    "customer" -> Seq("c_custkey" -> one(LongType), "c_name" -> one(StringType),
      "c_nationkey" -> one(IntegerType), "c_acctbal" -> one(DoubleType),
      "c_mktsegment" -> one(StringType)),
    "supplier" -> Seq("s_suppkey" -> one(LongType), "s_name" -> one(StringType),
      "s_nationkey" -> one(IntegerType), "s_acctbal" -> one(DoubleType)),
    "part" -> Seq("p_partkey" -> one(LongType), "p_name" -> one(StringType),
      "p_brand" -> one(StringType), "p_type" -> one(StringType),
      "p_size" -> one(IntegerType), "p_retailprice" -> one(DoubleType)),
    "orders" -> Seq("o_orderkey" -> one(LongType), "o_custkey" -> one(LongType),
      "o_orderstatus" -> one(StringType), "o_totalprice" -> one(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> one(StringType)),
    "lineitem" -> Seq("l_orderkey" -> one(LongType), "l_partkey" -> one(LongType),
      "l_suppkey" -> one(LongType), "l_linenumber" -> one(IntegerType),
      "l_quantity" -> one(DoubleType), "l_extendedprice" -> one(DoubleType),
      "l_discount" -> one(DoubleType), "l_tax" -> one(DoubleType),
      "l_returnflag" -> one(StringType), "l_linestatus" -> one(StringType),
      "l_shipdate" -> ts),
    // `events` is post-repair: ts must be exactly TimestampType.
    "events" -> Seq("event_id" -> one(LongType), "ts" -> one(TimestampType),
      "user_id" -> one(LongType), "event_type" -> one(StringType),
      "value" -> one(DoubleType), "props" -> one(StringType)),
    "documents" -> Seq("doc_id" -> one(LongType), "text" -> one(StringType),
      "lang" -> one(StringType), "source" -> one(StringType),
      "n_chars" -> one(LongType)),
    "embeddings" -> Seq("vec_id" -> one(LongType),
      "embedding" -> one(ArrayType(FloatType)), "label" -> one(IntegerType)))

  /** Array element types may load nullable or not depending on writer
    * metadata; `simpleString` omits nullability at every nesting level,
    * so comparing it ignores exactly that.
    */
  private def sameType(a: DataType, b: DataType): Boolean =
    a.simpleString == b.simpleString

  /** Run every check against one sf dir. Empty result = contract holds. */
  def check(spark: SparkSession, dir: String): Seq[String] = {
    val problems = Seq.newBuilder[String]
    Tables.names.foreach { name =>
      val loaded =
        try Some(Tables.load(spark, dir, name))
        catch { case e: Exception =>
          problems += s"$name: load failed: ${e.getMessage}"
          None
        }
      loaded.foreach { df =>
        val actual = df.schema.fields.map(f => f.name -> f.dataType).toSeq
        expectedSchemas.get(name) match {
          case None =>
            // Unguarded apply here would throw and abort the whole
            // preflight — the opposite of the warn-and-continue
            // contract. An uncontracted table is itself a finding.
            problems += s"$name: no data contract defined — " +
              "add it to Canary.expectedSchemas"
          case Some(exp) =>
            exp.map(Some(_)).zipAll(actual.map(Some(_)), None, None).foreach {
              case (None, Some((actName, _))) =>
                problems += s"$name: unexpected extra column $actName"
              case (Some((expName, _)), None) =>
                problems += s"$name: missing column $expName"
              case (Some((expName, expTypes)), Some((actName, actType))) =>
                if (expName != actName)
                  problems += s"$name: column order/name drift — " +
                    s"expected $expName, found $actName"
                else if (expTypes.nonEmpty && !expTypes.exists(sameType(_, actType)))
                  problems += s"$name.$actName: type drift — expected one of " +
                    s"${expTypes.map(_.simpleString).mkString("/")}, " +
                    s"found ${actType.simpleString}"
              case (None, None) => ()
            }
        }
        if (df.isEmpty) problems += s"$name: table is empty"
      }
    }
    // The clock check: one tiny agg over the single ts column (column-
    // pruned scan; fast at every sf we test).
    try {
      val row = Tables.load(spark, dir, "events")
        .agg(min("ts").as("lo"), max("ts").as("hi")).head()
      if (row.isNullAt(0)) problems += "events.ts: all null"
      else {
        val lo = row.getTimestamp(0)
        val hi = row.getTimestamp(1)
        val spanDays = (hi.getTime - lo.getTime) / 86400000.0
        val year = lo.toInstant.atZone(java.time.ZoneOffset.UTC).getYear
        if (spanDays < 1.0 || spanDays > 365.0)
          problems += f"events.ts: span $spanDays%.2f days outside [1, 365] — " +
            "rescaled clock? (ns-as-µs reads ~1000x long, µs-as-ns ~1000x short)"
        if (year < 2000 || year > 2100)
          problems += s"events.ts: min lands in year $year, outside [2000, 2100]"
      }
    } catch { case e: Exception =>
      problems += s"events.ts clock check failed: ${e.getMessage}"
    }
    // Embedding width: the quantization tier assumes 64-d (bqEncode
    // rejects others at runtime; PQ subspaces divide it). A regenerated
    // corpus with a new width should be named here, not mid-query.
    try {
      val widths = Tables.load(spark, dir, "embeddings")
        .select(size(col("embedding")).as("w")).distinct()
        .collect().map(_.getInt(0)).sorted
      if (widths.nonEmpty && widths.toSeq != Seq(64))
        problems += "embeddings.embedding: width(s) " +
          s"${widths.mkString("/")} != 64 — the quantization tier " +
          "(s07-s14) assumes 64-d; adapt before trusting those rows"
    } catch { case e: Exception =>
      problems += s"embeddings width check failed: ${e.getMessage}"
    }
    // Null embeddings: every similarity ranking assumes non-null
    // vectors (NULL codes now sort last via asc_nulls_last, but a
    // corpus that grew null rows deserves a named heads-up, not a
    // silent ranking convention).
    try {
      val nulls = Tables.load(spark, dir, "embeddings")
        .filter(col("embedding").isNull).count()
      if (nulls > 0)
        problems += s"embeddings.embedding: $nulls null vector(s) — " +
          "similarity rankings place them last (asc_nulls_last); " +
          "confirm that is the intended corpus shape"
    } catch { case e: Exception =>
      problems += s"embeddings null check failed: ${e.getMessage}"
    }
    problems.result()
  }
}
