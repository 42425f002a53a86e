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
 *     (case-insensitive tag names; at each '<' the first matching opener
 *     wins; an unterminated block drops to end of input).
 *  3. Strip all other tags `<...>` (non-greedy to the next '>').
 *  4. Decode exactly the 5 core entities &amp; &lt; &gt; &quot; &#NN;
 *     (decimal and &#xNN; hex numeric references) on the tag-stripped
 *     text (so an entity split by a removed tag still decodes).
 *  5. Collapse all whitespace runs to a single space; trim.
 *
 * Implementation is two fused passes (strip incl. script/style drop, then
 * entities + collapse) with no full-string case-conversion copies — this
 * function runs on every row of a 10^12-row corpus, so allocation churn is
 * the scaling bottleneck, not CPU.
 */
object TextExtract {

  def extract(html: Array[Byte]): String = extractFromString(
    new String(html, StandardCharsets.UTF_8)) // CharsetDecoder REPLACE policy

  def extractFromString(s: String): String =
    decodeAndCollapse(stripTags(s))

  @inline private def startsWithCI(s: String, i: Int, word: String): Boolean = {
    if (i + word.length > s.length) return false
    var k = 0
    while (k < word.length) {
      val c = s.charAt(i + k)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      if (lc != word.charAt(k)) return false
      k += 1
    }
    true
  }

  /** Case-insensitive index of `word` in `s` from `from`; -1 if absent. */
  @inline private def indexOfCI(s: String, from: Int, word: String): Int = {
    var i = from
    val limit = s.length - word.length
    while (i <= limit) {
      if (startsWithCI(s, i, word)) return i
      i += 1
    }
    -1
  }

  /** Pass 1: drop script/style elements (content included) and all tags. */
  private def stripTags(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        var dropped = false
        var w = 0
        while (!dropped && w < 2) {
          val name = if (w == 0) "script" else "style"
          if (startsWithCI(s, i + 1, name) &&
              (i + 1 + name.length == s.length ||
               !Character.isLetterOrDigit(s.charAt(i + 1 + name.length)))) {
            val close = "</" + name + ">"
            val end = indexOfCI(s, i, close)
            i = if (end < 0) s.length else end + close.length
            dropped = true
          }
          w += 1
        }
        if (!dropped) {
          val gt = s.indexOf('>', i + 1)
          i = if (gt < 0) s.length else gt + 1
        }
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  /** Replacement text for an entity body ("amp", "#233", "#x2F", ...), or
    * null when the body is not one of the 5 core entities / a strictly-
    * digits numeric reference (no '+'/'-' sign, no underscores, no
    * whitespace) — same rule as the mini-oracle, so the two
    * implementations can never disagree on exotic input. */
  private def entityReplacement(body: String): String = body match {
    case "amp" => "&"
    case "lt" => "<"
    case "gt" => ">"
    case "quot" => "\""
    case _ if body.startsWith("#x") || body.startsWith("#X") =>
      val digits = body.substring(2)
      if (digits.nonEmpty && digits.forall(ch =>
            (ch >= '0' && ch <= '9') || (ch >= 'a' && ch <= 'f') ||
            (ch >= 'A' && ch <= 'F')))
        try new String(Character.toChars(Integer.parseInt(digits, 16)))
        catch { case _: Exception => null }
      else null
    case _ if body.startsWith("#") =>
      val digits = body.substring(1)
      if (digits.nonEmpty && digits.forall(ch => ch >= '0' && ch <= '9'))
        try new String(Character.toChars(Integer.parseInt(digits)))
        catch { case _: Exception => null }
      else null
    case _ => null
  }

  /** Pass 2: entity decode + whitespace collapse + trim, fused. */
  private def decodeAndCollapse(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var started = false
    @inline def emit(str: String): Unit = {
      var k = 0
      while (k < str.length) { emitChar(str.charAt(k)); k += 1 }
    }
    @inline def emitChar(c: Char): Unit = {
      if (Character.isWhitespace(c)) { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        started = true
      }
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val rep = entityReplacement(s.substring(i + 1, semi))
          if (rep != null) { emit(rep); i = semi + 1 }
          else { emitChar(c); i += 1 }
        } else { emitChar(c); i += 1 }
      } else { emitChar(c); i += 1 }
    }
    sb.toString
  }

  /** countWsTokens(extract(html)) WITHOUT materializing the extracted
    * string: the extracted text joins tokens with single spaces, so tokens
    * = pendingSpace flushes + 1 — the counting loop mirrors
    * decodeAndCollapse's emit logic (shared entityReplacement) minus both
    * the output StringBuilder and the String->UTF8String re-encode. This is
    * the flagship's token path (the coverage job derives ONLY a count from
    * the extracted text); equality with the two-step form is property-
    * tested in TextSpec, and the TokenCountWs(ExtractText(_)) rewrite in
    * GraftExtensions applies it plan-wide. */
  def extractTokenCount(html: Array[Byte]): Int =
    countTokensFromString(new String(html, StandardCharsets.UTF_8))

  def countTokensFromString(raw: String): Int = {
    val s = stripTags(raw)
    var spaces = 0
    var pendingSpace = false
    var started = false
    @inline def emit(str: String): Unit = {
      var k = 0
      while (k < str.length) { emitChar(str.charAt(k)); k += 1 }
    }
    @inline def emitChar(c: Char): Unit = {
      if (Character.isWhitespace(c)) { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { spaces += 1; pendingSpace = false }
        started = true
      }
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val rep = entityReplacement(s.substring(i + 1, semi))
          if (rep != null) { emit(rep); i = semi + 1 }
          else { emitChar(c); i += 1 }
        } else { emitChar(c); i += 1 }
      } else { emitChar(c); i += 1 }
    }
    spaces + 1
  }

  /** Tokens separated by a single space, counting empty segments — exact
    * `size(split(text, ' '))` semantics without materializing the array
    * (the hot token-count path of the coverage job). */
  def countWsTokens(s: String): Int = {
    var n = 1
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') n += 1
      i += 1
    }
    n
  }
}
