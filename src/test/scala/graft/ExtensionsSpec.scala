package graft

import org.apache.spark.sql.functions._

/** The SparkSessionExtensions surface: injected optimizer rule + injected
  * SQL functions (the test session enables
  * spark.sql.extensions=graft.plans.GraftExtensions — see SparkTestBase). */
class ExtensionsSpec extends SparkTestBase {

  test("optimizer rule rewrites size(split(s, ' ')) to token_count_ws") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = docs.select(size(split(col("text"), " ")).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("token_count_ws"), optimized)
    assert(!optimized.toLowerCase.contains("split"), optimized)
    // and the rewrite is value-identical to the unoptimized semantics
    val viaRule = df.collect().map(_.getInt(0)).toSeq
    val manual = docs.collect().map(_.getAs[String]("text"))
      .map(t => t.count(_ == ' ') + 1).toSeq
    assert(viaRule.sorted == manual.sorted && viaRule.nonEmpty)
  }

  test("rule fuses token_count_ws(extract_text(html)) to extract_token_count") {
    val pages = sources.Pages.synthesize(spark, 200, 4)
    val df = pages.select(graft.functions.TextFunctions.tokenCountWs(
      graft.functions.TextFunctions.extractText(col("html"))).as("tok"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("extract_token_count"), optimized)
    assert(!optimized.contains("extract_text("), optimized)
    // exact-value contract vs the two-step form (rule-proof: computed via
    // a stored text column, which the rewrite cannot touch)
    val twoStep = pages
      .select(graft.functions.TextFunctions.tokenCountWs(col("text")).as("tok"))
      .collect().map(_.getInt(0)).toSeq.sorted
    assert(df.collect().map(_.getInt(0)).toSeq.sorted == twoStep)
    // the SQL composition fuses too (size∘split -> token_count_ws -> fused)
    pages.createOrReplaceTempView("pages_fuse")
    val sqlPlan = spark.sql(
      "SELECT size(split(extract_text(html), ' ')) AS t FROM pages_fuse")
      .queryExecution.optimizedPlan.toString
    assert(sqlPlan.contains("extract_token_count"), sqlPlan)
  }

  test("rule leaves non-matching splits alone") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (expr <- Seq("size(split(text, ','))", "size(split(text, ' ', 2))")) {
      val plan = docs.selectExpr(expr).queryExecution.optimizedPlan.toString
      assert(!plan.contains("token_count_ws"), s"$expr -> $plan")
    }
  }

  test("injected SQL functions work in a pure-SQL session") {
    spark.read.parquet(s"$sfDir/documents.parquet").createOrReplaceTempView("d")
    val r = spark.sql(
      """SELECT tag_classify('en:Title') AS c,
        |  tag_parse('en:some_page') AS k,
        |  cell_parent(cell_encode(45.0, 9.0, 12), 7) AS p,
        |  token_count_ws('a b c') AS t
        |FROM d LIMIT 1""".stripMargin).collect()(0)
    assert(r.getString(0) == "ok")
    assert(r.getString(1) == "en:Some page")
    assert(r.getLong(2) == graft.core.Cells.parent(
      graft.core.Cells.encode(45.0, 9.0, 12), 7))
    assert(r.getInt(3) == 3)
    val sk = spark.sql(
      "SELECT rolling_min_sketch('abcdefghijklmnopqrstuvwxyz', 16, 4) AS s")
      .collect()(0).getSeq[Long](0)
    assert(sk == graft.core.RollingHash.minSketch(
      "abcdefghijklmnopqrstuvwxyz", 16, 4).toSeq)
  }

  test("a pure-SQL spatial candidate+refine runs on injected geo functions") {
    // unit-square polygon as a SQL array literal; grid of test points
    val rings = "array(array(0.0D, 0.0D, 1.0D, 0.0D, 1.0D, 1.0D, 0.0D, 1.0D))"
    val rows = spark.sql(
      s"""SELECT lat, lon, pip_contains(lat, lon, $rings) AS inside,
         |  cell_disk(cell_encode(lat, lon, 7), 1) AS disk
         |FROM (SELECT CAST(i * 0.49 AS DOUBLE) AS lat FROM (SELECT explode(sequence(-2, 3)) AS i)) lats
         |CROSS JOIN (SELECT CAST(j * 0.49 AS DOUBLE) AS lon FROM (SELECT explode(sequence(-2, 3)) AS j)) lons""".stripMargin)
      .collect()
    rows.foreach { r =>
      val (lat, lon) = (r.getDouble(0), r.getDouble(1))
      val expected = graft.core.Geo.contains(lat, lon,
        Array(Array(0.0, 0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0)))
      assert(r.getBoolean(2) == expected, s"($lat,$lon)")
      assert(r.getSeq[Long](3).length == 9) // disk(1) = 3x3 neighborhood
    }
    assert(rows.count(_.getBoolean(2)) > 0 && rows.exists(!_.getBoolean(2)))
  }
}
