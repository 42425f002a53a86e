package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{CurationQueries, GeoQueries, MultimodalQueries, QueryDef, RelationalQueries, TextQueries}
import graft.sources.Pages

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  val registry: Seq[QueryDef] =
    RelationalQueries.all ++ GeoQueries.all ++ TextQueries.all ++
      MultimodalQueries.all ++ CurationQueries.all

  /** Flagship query: the full pages -> geocode -> spatial join -> tile
    * aggregation pipeline on a synthesized input_hint-shaped pages table
    * (driver smoke-checks rows > 0 at sf0.001 scale). */
  def entry(spark: SparkSession): DataFrame = {
    val pages = Pages.synthesize(spark, 5000, numPartitions = 32)
    Pipeline.tileStats(spark, pages, z = 8)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
