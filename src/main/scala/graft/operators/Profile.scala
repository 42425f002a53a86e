package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * One-pass table profiler (the data-quality step a training-data pipeline
 * runs before/after every transform): per column — row count, null count,
 * exact distinct count, min and max (computed on the native type, then
 * rendered as strings so heterogeneous columns share one schema).
 *
 * Single aggregation over the table (every stat is partial-aggregable;
 * countDistinct expands to one expand+agg internally), then a `stack`
 * unpivot of the one result row into (column, ...) rows — no per-column
 * scan. At 100 TB swap exact countDistinct for the KMV sketch estimate
 * (functions/KmvSketch) in the same slot.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__nn_$c`, `__nd_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    one.selectExpr("__n",
        s"stack(${cols.length}, $stackArgs) AS (column, n_non_null, n_distinct, min_str, max_str)")
      .select(col("column"), col("__n").as("n"),
        (col("__n") - col("n_non_null")).as("n_null"),
        col("n_distinct"), col("min_str"), col("max_str"))
  }
}
