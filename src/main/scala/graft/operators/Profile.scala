package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch

/**
 * One-pass table profiler (the data-quality step a training-data pipeline
 * runs before/after every transform): per column — row count, null count,
 * exact distinct count, min and max (computed on the native type, then
 * rendered as strings so heterogeneous columns share one schema).
 *
 * Single aggregation over the table (every stat is partial-aggregable;
 * countDistinct expands to one expand+agg internally), then a `stack`
 * unpivot of the one result row into (column, ...) rows — no per-column
 * scan.
 *
 * Two n_distinct variants, same output shape:
 *  - [[profile]]: EXACT countDistinct. Catalyst plans multi-distinct aggs
 *    via Expand, which multiplies scanned rows x(#distinct aggs + 1) — the
 *    right tool up to ~10^9 rows, wrong at the 100 TB tier.
 *  - [[profileApprox]]: KMV sketch (functions/KmvSketch) in the n_distinct
 *    slot — single pass, no Expand, bounded per-column state (k md5
 *    strings), merge-associative so partial aggregation applies. The
 *    sketch state is DETERMINISTIC (k smallest distinct md5s), so the
 *    estimate is a pure reproducible function of the data — oracle-checked
 *    by q_prof_events_approx, not just spec'd. Use this one at 100 TB.
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

  /** KMV cardinality estimate from a sketch column (ARRAY<STRING>, ascending
    * distinct md5s, size <= k): with fewer than k values the sketch IS the
    * distinct set (exact count); otherwise (k-1) / hash-space fraction of
    * the k-th minimum. Bit-identical to [[KmvSketch.estimate]] — same
    * 15-hex-digit (60-bit) parse and the same double op order — and
    * expressed in built-ins only so the DuckDB oracle reproduces it exactly. */
  def kmvEstimate(sketch: Column, k: Int): Column = {
    val kth = element_at(sketch, k)
    val v = (0 until 15).map { i =>
      (instr(lit("0123456789abcdef"), substring(kth, i + 1, 1)) - 1).cast("long") *
        lit(1L << (4 * (14 - i)))
    }.reduce(_ + _)
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (v.cast("double") / lit((1L << 60).toDouble)))
  }

  /** Numeric-distribution profile: EXACT quantiles per column, one
    * aggregation (percentile with a plateau array — sort-based exact;
    * Spark's rank = p*(n-1) linear interpolation is the same definition
    * DuckDB's quantile_cont uses, so the oracle matches bit-for-bit —
    * verified empirically on integer and double columns). Output:
    * (column, p, q).
    *
    * Scale note: exact percentile buffers per-partition value counts —
    * fine through ~10^9 rows / bounded-cardinality columns; at the 100-TB
    * tier use [[profileQuantilesApprox]], the same slot with bounded-memory
    * approx_percentile state — approximate results are NOT oracle-checked
    * (rank-error-bound spec instead, see its doc), the exact form is. */
  def profileQuantiles(df: DataFrame, cols: Seq[String],
                       ps: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    require(cols.nonEmpty && ps.nonEmpty)
    val psArr = s"array(${ps.map(p => s"${p}D").mkString(", ")})"
    val aggs = cols.map(c => expr(s"percentile(`$c`, $psArr)").as(s"__q_$c"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', `__q_$c`").mkString(", ")
    one.selectExpr(s"stack(${cols.length}, $stackArgs) AS (column, qs)")
      .select(col("column"), posexplode(col("qs")))
      .select(col("column"),
        element_at(typedLit(ps), col("pos") + 1).as("p"),
        col("col").as("q"))
  }

  /** The 100-TB quantile profiler: `approx_percentile` in the same slot as
    * [[profileQuantiles]] — bounded-memory QuantileSummaries state
    * (Greenwald–Khanna style), merge-associative so partial aggregation
    * applies, rank error <= 1/accuracy. Same output shape (column, p, q;
    * q cast to double for shape parity with the exact variant).
    *
    * NOT oracle-hashed, by design: the returned value is an actual data
    * point whose choice depends on the summary-merge tree, so cross-engine
    * bit-equality is not defined the way it is for the exact
    * rank-interpolation formula. Correctness is asserted as a RANK-ERROR
    * BOUND against the sorted data in CurationSpec instead — the
    * documented contract of the approximation. */
  def profileQuantilesApprox(df: DataFrame, cols: Seq[String],
                             ps: Seq[Double] = Seq(0.25, 0.5, 0.75),
                             accuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty && ps.nonEmpty && accuracy >= 1)
    val psArr = s"array(${ps.map(p => s"${p}D").mkString(", ")})"
    val aggs = cols.map(c =>
      expr(s"approx_percentile(`$c`, $psArr, $accuracy)").as(s"__q_$c"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', `__q_$c`").mkString(", ")
    one.selectExpr(s"stack(${cols.length}, $stackArgs) AS (column, qs)")
      .select(col("column"), posexplode(col("qs")))
      .select(col("column"),
        element_at(typedLit(ps), col("pos") + 1).as("p"),
        col("col").cast("double").as("q"))
  }

  /** The 100-TB profiler: one pass, no Expand — n_distinct_est is the KMV
    * estimate over md5(col). Columns hash through CAST(col AS STRING), the
    * repo's cross-engine-stable hash input discipline. */
  def profileApprox(df: DataFrame, cols: Seq[String], k: Int = 16): DataFrame = {
    require(cols.nonEmpty)
    val kmv = udaf(new KmvSketch(k))
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        kmv(md5(col(c).cast("string"))).as(s"__sk_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val withEst = one.select(col("__n") +: cols.flatMap { c =>
      Seq(col(s"__nn_$c"), kmvEstimate(col(s"__sk_$c"), k).as(s"__nd_$c"),
        col(s"__min_$c"), col(s"__max_$c"))
    }: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__nn_$c`, `__nd_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    withEst.selectExpr("__n",
        s"stack(${cols.length}, $stackArgs) AS (column, n_non_null, n_distinct_est, min_str, max_str)")
      .select(col("column"), col("__n").as("n"),
        (col("__n") - col("n_non_null")).as("n_null"),
        col("n_distinct_est"), col("min_str"), col("max_str"))
  }
}
