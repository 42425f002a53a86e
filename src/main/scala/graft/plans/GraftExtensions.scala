package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._

/**
 * Catalyst extension point (SparkSessionExtensions): install with
 * `spark.sql.extensions=graft.plans.GraftExtensions` (or
 * `builder.withExtensions(GraftExtensions.register)`). Two injections:
 *
 * 1. An optimizer Rule that rewrites `size(split(s, ' '))` — the natural
 *    way to ask for a whitespace token count in SQL — into the codegen
 *    [[graft.functions.TokenCountWs]] expression, which counts separator
 *    bytes in place instead of materializing a string array per row.
 *    Exact-semantics rewrite: Spark's split keeps trailing empty segments
 *    at limit -1, and tokens = ' '-bytes + 1 counts them identically
 *    (single-space literal pattern only; legacy sizeOfNull excluded).
 *
 * 2. The graft expression surface as SQL functions, so a pure-SQL session
 *    gets extract_text / geo_lat / cell_encode / ... without calling the
 *    Scala registration helper.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.register(ext)
}

object GraftExtensions {

  object TokenCountRewrite extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case Size(StringSplit(child,
              Literal(pat: UTF8String, StringType),
              Literal(-1, IntegerType)), false)
            if pat.toString == " " =>
          TokenCountWs(child)
        // token count over freshly extracted text: fuse away the extracted
        // string entirely (no output buffer, no UTF8String re-encode) —
        // exact-equality contract in TextSpec. Fires AFTER the rule above,
        // so size(split(extract_text(h), ' ')) fuses in one optimizer pass
        // too (transformAllExpressions is bottom-up).
        case TokenCountWs(ExtractText(html)) =>
          ExtractTokenCount(html)
      }
  }

  private def fn(name: String, builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      builder)

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => TokenCountRewrite)
    ext.injectFunction(fn("extract_text", e => ExtractText(e.head)))
    ext.injectFunction(fn("geo_lat", e => GeoLat(e.head)))
    ext.injectFunction(fn("geo_lon", e => GeoLon(e.head)))
    ext.injectFunction(fn("token_count_ws", e => TokenCountWs(e.head)))
    ext.injectFunction(fn("extract_token_count", e => ExtractTokenCount(e.head)))
    ext.injectFunction(fn("tag_normalize", e => TagNormalize(e(0), e(1))))
    ext.injectFunction(fn("tag_classify", e => TagClassify(e.head)))
    ext.injectFunction(fn("tag_parse", e => TagParse(e.head)))
    ext.injectFunction(fn("cell_encode", e => CellEncode(e(0), e(1), e(2))))
    ext.injectFunction(fn("cell_parent", e => CellParent(e(0), e(1))))
    ext.injectFunction(fn("cell_ring", e => CellRing(e(0), e(1))))
    ext.injectFunction(fn("cell_disk", e => CellDisk(e(0), e(1))))
    ext.injectFunction(fn("cell_tile_x", e => CellTileX(e.head)))
    ext.injectFunction(fn("cell_tile_y", e => CellTileY(e.head)))
    ext.injectFunction(fn("cell_from_xy", e => CellFromXY(e(0), e(1), e(2))))
    ext.injectFunction(fn("cell_bounds", e => CellBounds(e.head)))
    ext.injectFunction(fn("cell_quadkey", e => CellQuadkey(e.head)))
    ext.injectFunction(fn("quadkey_cell", e => QuadkeyCell(e.head)))
    ext.injectFunction(fn("pip_contains", e => PipContains(e(0), e(1), e(2))))
    ext.injectFunction(fn("pip_contains_packed",
      e => PipContainsPacked(e(0), e(1), e(2), e(3))))
    ext.injectFunction(fn("rolling_min_sketch", e => RollingMinSketch(e(0),
      intLit(e(1), "rolling_min_sketch.w"), intLit(e(2), "rolling_min_sketch.k"))))
    ext.injectFunction(fn("rolling_min_fp", e => RollingMinFingerprint(e(0),
      intLit(e(1), "rolling_min_fp.w"))))
  }

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
}
