package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{Geocode, TagKey, TextExtract}

/** Codegen-friendly expressions for the text-side pure functions
  * (SURVEY.md §2 rows B1-B3): HTML->text extraction (the byte-identical
  * invariant of BASELINE.json), HTML geocoding, and wikipedia-tag key
  * normalization / malformed-value classification. */
object TextRuntime {
  def extract(html: Array[Byte]): UTF8String =
    UTF8String.fromString(TextExtract.extract(html))

  // geo_lat and geo_lon are separate expressions over the same html cell;
  // a per-thread one-entry memo (keyed by array identity) makes the pair
  // cost one parse per row instead of two. Pure w.r.t. the input bytes,
  // so determinism is unaffected.
  private val lastGeo =
    new ThreadLocal[(Array[Byte], Option[(Double, Double)])] {
      override def initialValue(): (Array[Byte], Option[(Double, Double)]) =
        (null, None)
    }
  private def geoMemo(html: Array[Byte]): Option[(Double, Double)] = {
    val cached = lastGeo.get()
    if (cached._1 eq html) cached._2
    else {
      val r = Geocode.fromHtml(html)
      lastGeo.set((html, r))
      r
    }
  }
  def geoLat(html: Array[Byte]): java.lang.Double =
    geoMemo(html) match { case Some((lat, _)) => lat; case None => null }
  def geoLon(html: Array[Byte]): java.lang.Double =
    geoMemo(html) match { case Some((_, lon)) => lon; case None => null }
  def extractTokenCount(html: Array[Byte]): Int =
    TextExtract.extractTokenCount(html)
  def tokenCount(text: UTF8String): Int = {
    // count ' ' bytes + 1 directly on UTF-8 bytes (space never appears in
    // a multi-byte sequence) — zero allocation
    val n = text.numBytes()
    var spaces = 0
    var i = 0
    while (i < n) {
      if (text.getByte(i) == ' '.toByte) spaces += 1
      i += 1
    }
    spaces + 1
  }
  def tagNormalize(lang: UTF8String, raw: UTF8String): UTF8String =
    UTF8String.fromString(TagKey.normalize(lang.toString, raw.toString))
  def tagClassify(raw: UTF8String): UTF8String =
    UTF8String.fromString(TagKey.classify(raw.toString))
  def tagParse(raw: UTF8String): UTF8String =
    TagKey.parse(raw.toString) match {
      case Some(k) => UTF8String.fromString(k)
      case None => null
    }
}

/** extract_text(html BINARY) -> STRING (deterministic, byte-identical). */
case class ExtractText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_text"
  override protected def nullSafeEval(html: Any): Any =
    TextRuntime.extract(html.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, html => s"graft.functions.TextRuntime.extract($html)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** geo_lat(html BINARY) -> DOUBLE (null when the page has no geo meta). */
case class GeoLat(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "geo_lat"
  override protected def nullSafeEval(html: Any): Any =
    TextRuntime.geoLat(html.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, html => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.TextRuntime.geoLat($html);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** geo_lon(html BINARY) -> DOUBLE (null when the page has no geo meta). */
case class GeoLon(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "geo_lon"
  override protected def nullSafeEval(html: Any): Any =
    TextRuntime.geoLon(html.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, html => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.TextRuntime.geoLon($html);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** token_count_ws(text) -> INT: size(split(text, ' ')) without the array. */
case class TokenCountWs(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_count_ws"
  override protected def nullSafeEval(text: Any): Any =
    TextRuntime.tokenCount(text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, text => s"graft.functions.TextRuntime.tokenCount($text)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** extract_token_count(html BINARY) -> INT: token_count_ws(extract_text(
  * html)) without materializing the extracted string (no output buffer, no
  * String->UTF8String re-encode) — the flagship coverage job derives only a
  * token count from the text, so the fused form removes two of the per-row
  * allocations on a 10^12-row path. Installed plan-wide by the
  * GraftExtensions rewrite rule; exact equality with the two-step form is
  * property-tested (TextSpec). */
case class ExtractTokenCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "extract_token_count"
  override protected def nullSafeEval(html: Any): Any =
    TextRuntime.extractTokenCount(html.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, html =>
      s"graft.functions.TextRuntime.extractTokenCount($html)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** tag_normalize(lang, raw) -> STRING join key (SURVEY.md §1.7). */
case class TagNormalize(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tag_normalize"
  override protected def nullSafeEval(lang: Any, raw: Any): Any =
    TextRuntime.tagNormalize(lang.asInstanceOf[UTF8String], raw.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lang, raw) =>
      s"graft.functions.TextRuntime.tagNormalize($lang, $raw)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression):
      Expression = copy(l, r)
}

/** tag_classify(raw) -> STRING error class ('ok' when well-formed). */
case class TagClassify(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tag_classify"
  override protected def nullSafeEval(raw: Any): Any =
    TextRuntime.tagClassify(raw.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, raw => s"graft.functions.TextRuntime.tagClassify($raw)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** tag_parse(raw) -> STRING normalized key, null when malformed. */
case class TagParse(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "tag_parse"
  override protected def nullSafeEval(raw: Any): Any =
    TextRuntime.tagParse(raw.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, raw => {
      s"""
         |org.apache.spark.unsafe.types.UTF8String ${ev.value}_r =
         |  graft.functions.TextRuntime.tagParse($raw);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object TextFunctions {
  import ColumnBridge.{column, expression}
  def extractText(html: Column): Column = column(ExtractText(expression(html)))
  def tokenCountWs(text: Column): Column = column(TokenCountWs(expression(text)))
  def extractTokenCount(html: Column): Column =
    column(ExtractTokenCount(expression(html)))
  def geoLat(html: Column): Column = column(GeoLat(expression(html)))
  def geoLon(html: Column): Column = column(GeoLon(expression(html)))
  def tagNormalize(lang: Column, raw: Column): Column =
    column(TagNormalize(expression(lang), expression(raw)))
  def tagClassify(raw: Column): Column = column(TagClassify(expression(raw)))
  def tagParse(raw: Column): Column = column(TagParse(expression(raw)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def add(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    add("extract_text", e => ExtractText(e.head))
    add("extract_token_count", e => ExtractTokenCount(e.head))
    add("geo_lat", e => GeoLat(e.head))
    add("geo_lon", e => GeoLon(e.head))
    add("tag_normalize", e => TagNormalize(e(0), e(1)))
    add("tag_classify", e => TagClassify(e.head))
    add("tag_parse", e => TagParse(e.head))
  }
}
