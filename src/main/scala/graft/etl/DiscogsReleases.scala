package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Discogs `releases` XML (gzipped) → Snappy Parquet — the whole
  * reference program (`/root/reference/src/main.rs`), re-expressed
  * Spark-first.
  *
  * The reference's 931 LoC of hand-rolled pull parsing, grammar
  * validation, columnar builders and batched Parquet writing collapse
  * to: one declared read schema (ReleaseSchema.xmlSchema), one
  * `spark.read.format("xml")`, one projection, one
  * `write.parquet` — Catalyst and the Parquet writer supply the
  * column pruning, batching, dictionary encoding and Snappy
  * compression the reference implements manually (SURVEY.md §4).
  *
  * Semantics replicated exactly (pinned by DiscogsReleasesSpec):
  *  - `catno` attr → `cat_no` column (`main.rs:649-653` vs `181`)
  *  - `master_id`/`is_main_release` null iff the `<master_id>`
  *    element is absent (`main.rs:510`, `557-560`)
  *  - `anv`/`join` null when the element is empty (`main.rs:718-741`)
  *  - absent list containers → empty lists, not nulls (the
  *    reference's builders always seal a list per row,
  *    `main.rs:391-403`)
  *  - `role`/`tracks` and the nine skip-subtrees are never
  *    materialized (`main.rs:742-749`, `758-917`)
  *
  * Known deviation (documented, not copied): the reference manually
  * unescapes ONLY `&amp;` in genre/style text (`main.rs:596`, `619`),
  * so `&lt;` etc. would pass through escaped. Spark's XML reader
  * unescapes all standard entities. For `&amp;` — the only entity in
  * real Discogs genre/style values — behavior is identical.
  *
  * Scale: one `.xml.gz` is non-splittable (one task — same
  * sequential bound as the reference). At 100 TB you'd ingest many
  * dump files (one task each) or re-chunk once; everything downstream
  * of the scan parallelizes.
  */
object DiscogsReleases {

  private def emptyArr(tpe: String): Column = array().cast(s"array<$tpe>")

  /** Read the raw XML with the declared schema (FAILFAST: malformed
    * content errors out rather than yielding silent nulls — the
    * Spark equivalent of the reference's panic-on-unexpected,
    * SURVEY S3/S5/S6).
    */
  def read(spark: SparkSession, input: String): DataFrame =
    spark.read
      .format("xml")
      .option("rowTag", "release")
      .option("attributePrefix", "_")
      .option("valueTag", "_VALUE")
      .option("mode", "FAILFAST")
      .schema(ReleaseSchema.xmlSchema)
      .load(input)

  /** The single projection that produces the reference's output
    * schema: attribute casts, nested renames via `transform`, the
    * master_id flattening, and empty-list defaults.
    */
  def transformReleases(raw: DataFrame): DataFrame = {
    // Spark's XML source yields "" for an empty element; the reference
    // pushes null for empty <anv>/<join> (main.rs:718-741) — nullif
    // restores that rule exactly.
    val artists = coalesce(
      transform(col("artists.artist"), a =>
        struct(
          a.getField("id").as("id"),
          a.getField("name").as("name"),
          nullif(a.getField("anv"), lit("")).as("anv"),
          nullif(a.getField("join"), lit("")).as("join"))),
      emptyArr("struct<id:string,name:string,anv:string,join:string>"))
    val labels = coalesce(
      transform(col("labels.label"), l =>
        struct(
          l.getField("_id").as("id"),
          l.getField("_catno").as("cat_no"),
          l.getField("_name").as("name"))),
      emptyArr("struct<id:string,cat_no:string,name:string>"))
    raw.select(
      col("_id").cast("int").as("id"),
      col("_status").as("status"),
      col("title"),
      artists.as("artists"),
      coalesce(col("genres.genre"), emptyArr("string")).as("genres"),
      coalesce(col("styles.style"), emptyArr("string")).as("styles"),
      labels.as("labels"),
      col("master_id._is_main_release").as("is_main_release"),
      col("master_id._VALUE").cast("int").as("master_id"))
  }

  /** Post-read assertions standing in for the reference's runtime
    * panics (`main.rs:496-500`, `826-836`): required fields present,
    * status within the seeded dictionary. Throws on violation.
    */
  def validate(out: DataFrame): Unit = {
    val bad = out.filter(
      col("id").isNull || col("status").isNull || col("title").isNull ||
        !col("status").isin(ReleaseSchema.knownStatuses: _*))
    val n = bad.count()
    require(n == 0, s"$n release rows violate the reference's invariants")
  }

  /** Strict unknown-content check — the dataset-level equivalent of
    * the reference's panic on unknown attributes/elements
    * (`main.rs:496-500`, `549-554`, `750-753`). The declarative read
    * silently prunes undeclared fields, so strict mode re-infers the
    * schema from the data and fails on any top-level field that is
    * neither declared nor a known skip-subtree. Costs one extra scan;
    * opt-in, exactly like the reference's always-on strictness is a
    * design choice.
    */
  def validateNoUnknownContent(spark: SparkSession, input: String): Unit = {
    val inferred = spark.read
      .format("xml")
      .option("rowTag", "release")
      .option("attributePrefix", "_")
      .option("valueTag", "_VALUE")
      .load(input)
      .schema.fieldNames.toSet
    val declared = ReleaseSchema.xmlSchema.fieldNames.toSet
    val skipSubtrees = Set( // main.rs:758-917 + per-release extras
      "images", "extraartists", "formats", "country", "data_quality",
      "tracklist", "videos", "released", "companies", "notes",
      "identifiers")
    val unknown = inferred -- declared -- skipSubtrees
    require(unknown.isEmpty,
      s"unknown release content (reference would panic): ${unknown.mkString(", ")}")
  }

  def run(spark: SparkSession, input: String, output: String): Unit = {
    val out = transformReleases(read(spark, input))
    out.write
      .mode("overwrite")
      .option("compression", "snappy") // the reference's WriterProperties (main.rs:219-221)
      .parquet(output)
  }

  /** Same 2-arg CLI contract as the reference (`main.rs:919-930`). */
  def main(args: Array[String]): Unit = {
    if (args.length != 2) {
      System.err.println("Usage: DiscogsReleases <input.xml.gz> <output-dir>")
      sys.exit(1)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("discogs-releases")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try run(spark, args(0), args(1))
    finally spark.stop()
  }
}
