package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

import graft.core.{Cells, Geo, Polygons, TagKey, TextExtract}

/** Cross-LANGUAGE parity: the stdlib-Python mini-oracle (tools/
  * mini_oracle.py, SURVEY.md §0.1-5) must agree with the Scala core on
  * every correctness-critical pure function — evidence the semantics are
  * specified by math, not JVM accident. */
class MiniOracleSpec extends AnyFunSuite {

  private def ask(lines: Seq[String]): Seq[String] = {
    val in = new java.io.ByteArrayInputStream(
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    val out = new StringBuilder
    val code = (Seq("python3", "tools/mini_oracle.py") #< in)
      .run(BasicIO(false, s => { out.append(s).append('\n') }, None)).exitValue()
    assert(code == 0, s"mini_oracle failed: $out")
    out.toString.split("\n").toSeq.filter(_.nonEmpty)
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  test("extract parity on html cases incl. entities/utf8/script") {
    val cases = Seq(
      "<html><body><p>hello world</p></body></html>",
      "<p>a&amp;b &lt;c&gt; &quot;d&quot; &#233; &#x41;</p>",
      "<div>a</div>  \n\t <div>b</div>",
      "x<script>var a = '<p>no</p>';</script>y",
      "x<STYLE>p { color: red }</STYLE>y",
      "a &unknown; b & c",
      "<p>café 中文</p>",
      "<p>multi   ish   spaces</p>",
      // strict entity bodies: underscores, whitespace, signs, overflow and
      // bad hex must stay literal IDENTICALLY in both implementations
      "<p>&#1_0; &# 12; &#+12; &#-12; &#x1F600; &#xZZ; &#2147483648; &#x7fffffff; &#;</p>")
    val b64 = cases.map(s => java.util.Base64.getEncoder
      .encodeToString(s.getBytes("UTF-8")))
    val res = ask(b64.map(b => s"""{"op":"extract","html_b64":"$b"}"""))
    cases.zip(res).foreach { case (html, line) =>
      val expected = TextExtract.extractFromString(html)
      // compare via JSON round-trip of the expected value
      val expectedJson = s"""{"text": ${jsonStr(expected)}}"""
      assert(parseText(line) == expected,
        s"html=$html scala=$expected py=$line ($expectedJson)")
    }
  }

  private def parseText(jsonLine: String): String = {
    // minimal JSON string extractor for {"text": "..."} / {"key": "..."}
    val m = """\{"(?:text|key)": "((?:[^"\\]|\\.)*)"\}""".r
      .findFirstMatchIn(jsonLine).getOrElse(fail(s"bad json: $jsonLine"))
    val raw = m.group(1)
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\') {
        raw.charAt(i + 1) match {
          case 'u' =>
            sb.append(Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  test("normalize parity") {
    val cases = Seq(("it", "colosseo"), ("en", "new_york_city"),
      ("EN ", "  spaced   title "), ("de", "%C3%9Cberlingen"),
      ("fr", "caf%c3%a9"), ("en", "a"),
      // simple vs full case mapping: ß and ligature-first titles must not
      // expand (Java Character.toUpperCase is a simple mapping)
      ("de", "ßtraße"), ("en", "ﬁrst_ligature"), ("tr", "istanbul"))
    val res = ask(cases.map { case (l, r) =>
      s"""{"op":"normalize","lang":${jsonStr(l)},"raw":${jsonStr(r)}}""" })
    cases.zip(res).foreach { case ((l, r), line) =>
      assert(parseText(line) == TagKey.normalize(l, r), s"$l:$r -> $line")
    }
  }

  test("normalize parity fuzz: 150 seeded random raw titles") {
    val rnd = new scala.util.Random(20260816L)
    val alphabet = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++
      Seq(' ', '_', '%', ':', '.', '-', '\t', 'é', 'ß', 'Ü', '中', 'ı', 'İ')
    def randStr(n: Int): String =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val cases = (0 until 150).map { _ =>
      (Seq("en", "de", "tr", "IT ")(rnd.nextInt(4)), randStr(1 + rnd.nextInt(24)))
    }
    val res = ask(cases.map { case (l, r) =>
      s"""{"op":"normalize","lang":${jsonStr(l)},"raw":${jsonStr(r)}}""" })
    cases.zip(res).foreach { case ((l, r), line) =>
      assert(parseText(line) == TagKey.normalize(l, r), s"$l:[$r] -> $line")
    }
  }

  test("cell encode / parent / tile parity on a lat/lon grid") {
    val pts = for {
      lat <- Seq(-89.99, -45.5, -0.01, 0.0, 33.33, 59.5, 89.99)
      lon <- Seq(-179.99, -120.7, -0.5, 0.0, 64.37, 179.99)
      r <- Seq(7, 10, 12)
    } yield (lat, lon, r)
    val res = ask(pts.map { case (lat, lon, r) =>
      s"""{"op":"encode","lat":$lat,"lon":$lon,"r":$r}""" })
    pts.zip(res).foreach { case ((lat, lon, r), line) =>
      val expected = Cells.encode(lat, lon, r)
      assert(line == s"""{"cell": $expected}""", s"($lat,$lon,$r) -> $line")
    }
    val cells = pts.map { case (lat, lon, r) => Cells.encode(lat, lon, r) }
    val res2 = ask(cells.map(c => s"""{"op":"tile_xy","cell":$c}"""))
    cells.zip(res2).foreach { case (c, line) =>
      val (x, y) = Cells.toXY(c)
      assert(line == s"""{"x": $x, "y": $y}""", s"$c -> $line")
    }
  }

  test("pip parity on all fixture polygons over a point grid") {
    val pts = for {
      lat <- BigDecimal(-60) to BigDecimal(60) by BigDecimal("3.37")
      lon <- BigDecimal(-180) to BigDecimal(179) by BigDecimal("7.13")
    } yield (lat.toDouble, lon.toDouble)
    Polygons.all.foreach { p =>
      val rings = p.rings.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      val res = ask(pts.map { case (lat, lon) =>
        s"""{"op":"pip","lat":$lat,"lon":$lon,"rings":$rings}""" })
      pts.zip(res).foreach { case ((lat, lon), line) =>
        val expected = Geo.contains(lat, lon, p.rings)
        assert(line == s"""{"inside": $expected}""",
          s"poly=${p.name} ($lat,$lon) -> $line")
      }
    }
  }
}
