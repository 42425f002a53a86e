package graft.core

import java.nio.charset.StandardCharsets

/**
 * Deterministic HTML -> text extraction (SURVEY.md §1.7). The per-row
 * invariant in BASELINE.json ("byte-identical extracted text per url")
 * makes this a correctness function, not preprocessing, so the grammar is
 * small and fully specified:
 *
 *  1. UTF-8 decode with the standard REPLACE policy (malformed sequences
 *     become U+FFFD — fixed, documented).
 *  2. Drop <script>...</script> and <style>...</style> including content
 *     (case-insensitive tag names).
 *  3. Strip all other tags `<...>` (non-greedy to the next '>').
 *  4. Decode exactly the 5 core entities &amp; &lt; &gt; &quot; &#NN;
 *     (decimal and &#xNN; hex numeric references).
 *  5. Collapse all whitespace runs to a single space; trim.
 */
object TextExtract {

  def extract(html: Array[Byte]): String = extractFromString(
    new String(html, StandardCharsets.UTF_8)) // CharsetDecoder REPLACE policy

  def extractFromString(s: String): String = {
    val noScript = dropElement(dropElement(s, "script"), "style")
    val sb = new java.lang.StringBuilder(noScript.length)
    var i = 0
    var inTag = false
    while (i < noScript.length) {
      val c = noScript.charAt(i)
      if (inTag) { if (c == '>') inTag = false }
      else if (c == '<') inTag = true
      else sb.append(c)
      i += 1
    }
    collapseWs(decodeEntities(sb.toString))
  }

  /** Remove <name ...>...</name> blocks, case-insensitive, non-nested. */
  private def dropElement(s: String, name: String): String = {
    val lower = s.toLowerCase
    val open = "<" + name
    val close = "</" + name + ">"
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (lower.startsWith(open, i) &&
          (i + open.length == s.length ||
           !Character.isLetterOrDigit(lower.charAt(i + open.length)))) {
        val end = lower.indexOf(close, i)
        i = if (end < 0) s.length else end + close.length
      } else {
        sb.append(s.charAt(i))
        i += 1
      }
    }
    sb.toString
  }

  private def decodeEntities(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val rep = body match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case _ if body.startsWith("#x") || body.startsWith("#X") =>
              try new String(Character.toChars(Integer.parseInt(body.substring(2), 16)))
              catch { case _: Exception => null }
            case _ if body.startsWith("#") =>
              try new String(Character.toChars(Integer.parseInt(body.substring(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        started = true
      }
      i += 1
    }
    sb.toString
  }
}
