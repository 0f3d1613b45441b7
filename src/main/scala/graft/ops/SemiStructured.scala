package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured ingestion on Spark 4's VARIANT type — the schema-drift
  * path for event properties / API payloads where `from_json` with a
  * frozen StructType silently nulls every field the producer renamed.
  *
  * VARIANT parses once into a binary-encoded tree (shredded, no
  * per-access re-parse — unlike `get_json_object`, which re-parses the
  * string for EVERY path) and `variant_get` extracts typed paths lazily.
  * At 100 TB the difference is a full re-tokenize of the payload column
  * per extracted field vs one parse amortized over all of them; both
  * stay inside whole-stage codegen.
  *
  * The reference has no semi-structured surface (its inputs are already
  * EDN data); this is part of the engine's extension tier.
  */
object SemiStructured {

  /** Parse a JSON string column once and extract `paths` as typed
    * columns. Each path is (alias, variant path like "$.k", target DDL
    * type like "bigint"); malformed payloads become null rows rather
    * than failures (`try_parse_json` + `try_variant_get` — the
    * batch-robust choice for crawled/third-party payloads). */
  def variantExtract(df: DataFrame, json: Column,
                     paths: Seq[(String, String, String)]): DataFrame = {
    require(paths.nonEmpty, "at least one extraction path required")
    val parsed = df.withColumn("__var", try_parse_json(json))
    paths.foldLeft(parsed)((d, p) => p match {
      case (alias, path, ddl) =>
        d.withColumn(alias, try_variant_get(col("__var"), path, ddl))
    }).drop("__var")
  }

  /** Per-group merged schema of a JSON payload column — the drift
    * monitor ("which event types started shipping a new field this
    * week"). `schema_of_variant_agg` merges per-row schemas in a
    * mergeable aggregation state (map-side partials), so the report is
    * one agg-sized shuffle over the corpus, no driver collection. */
  def variantSchemaProfile(df: DataFrame, group: Column, json: Column)
      : DataFrame =
    df.select(group.as("g"), try_parse_json(json).as("__var"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
           schema_of_variant_agg(col("__var")).as("merged_schema"))
}
