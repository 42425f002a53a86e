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
  def extractTokenCount(html: Array[Byte]): Int = {
    // ASCII fast path: when every byte is < 0x80, char == byte for the
    // whole grammar (tag names, entities, Character.isWhitespace on
    // 0x09-0x0D/0x1C-0x1F/0x20), so both passes run on the raw bytes with
    // ZERO string/char decoding — the common case for web markup. Any
    // high byte falls back to the exact string path (multibyte text,
    // malformed-UTF-8 replacement, unicode whitespace classes).
    var i = 0
    while (i < html.length) {
      if (html(i) < 0) return countTokensFromString(
        new String(html, StandardCharsets.UTF_8))
      i += 1
    }
    countTokensAscii(html)
  }

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

  // --- ASCII byte-level twins of stripTags + the counting pass (the
  // extractTokenCount fast path; semantics proven equal to the string
  // path for all-ASCII input by the TextSpec fuzz, which routes unicode
  // fragments to the fallback and ASCII-only ones here) ---

  @inline private def startsWithCIB(s: Array[Byte], i: Int, word: String): Boolean = {
    if (i + word.length > s.length) return false
    var k = 0
    while (k < word.length) {
      val c = s(i + k)
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
      if (lc != word.charAt(k).toByte) return false
      k += 1
    }
    true
  }

  @inline private def indexOfCIB(s: Array[Byte], from: Int, word: String): Int = {
    var i = from
    val limit = s.length - word.length
    while (i <= limit) {
      if (startsWithCIB(s, i, word)) return i
      i += 1
    }
    -1
  }

  // round-6: the strip-pass scratch buffer is thread-local (grown on
  // demand), not a fresh 1-4 KB allocation per row — extractTokenCount is
  // the per-row invariant of a 10^12-row corpus, and this pass is its only
  // remaining allocation. Safe: countTokensAscii never nests or escapes
  // the buffer.
  private val tlStripBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  private def countTokensAscii(s: Array[Byte]): Int = {
    // pass 1: strip tags + script/style blocks into a byte buffer
    var buf = tlStripBuf.get()
    if (buf.length < s.length) {
      // next power of two, overflow-safe: for inputs >= 2^30 bytes the
      // doubled size would wrap Int, so fall back to the exact length
      val doubled = Integer.highestOneBit(s.length) * 2
      buf = new Array[Byte](if (doubled < s.length) s.length else doubled)
      tlStripBuf.set(buf)
    }
    var blen = 0
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '<') {
        var dropped = false
        var w = 0
        while (!dropped && w < 2) {
          val name = if (w == 0) "script" else "style"
          if (startsWithCIB(s, i + 1, name) &&
              (i + 1 + name.length == s.length ||
               !isAsciiLetterOrDigit(s(i + 1 + name.length)))) {
            val close = "</" + name + ">"
            val end = indexOfCIB(s, i, close)
            i = if (end < 0) s.length else end + close.length
            dropped = true
          }
          w += 1
        }
        if (!dropped) {
          var gt = i + 1
          while (gt < s.length && s(gt) != '>') gt += 1
          i = if (gt >= s.length) s.length else gt + 1
        }
      } else {
        buf(blen) = c; blen += 1
        i += 1
      }
    }
    // pass 2: entity decode + whitespace collapse, counting only
    var spaces = 0
    var pendingSpace = false
    var started = false
    @inline def emitCp(cp: Int): Unit = {
      // int overload == per-char semantics here: all whitespace codepoints
      // are BMP, and surrogate halves of supplementary chars are never
      // whitespace either way
      if (Character.isWhitespace(cp)) { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { spaces += 1; pendingSpace = false }
        started = true
      }
    }
    i = 0
    while (i < blen) {
      val c = buf(i)
      if (c == '&') {
        var semi = -1
        var j = i + 1
        while (semi < 0 && j < blen && j - i <= 10) {
          if (buf(j) == ';') semi = j
          j += 1
        }
        val cp = if (semi < 0) -1 else entityCodepointAscii(buf, i + 1, semi)
        if (cp >= 0) { emitCp(cp); i = semi + 1 }
        else { emitCp('&'); i += 1 }
      } else { emitCp(c); i += 1 }
    }
    spaces + 1
  }

  @inline private def isAsciiLetterOrDigit(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  /** Byte twin of [[entityReplacement]], returning the decoded CODEPOINT
    * (all five named entities and valid numeric references decode to one
    * codepoint) or -1 when the body is not a recognized entity. */
  private def entityCodepointAscii(s: Array[Byte], from: Int, to: Int): Int = {
    val len = to - from
    @inline def is(word: String): Boolean = {
      if (len != word.length) return false
      var k = 0
      while (k < len) { if (s(from + k) != word.charAt(k).toByte) return false; k += 1 }
      true
    }
    if (is("amp")) '&'
    else if (is("lt")) '<'
    else if (is("gt")) '>'
    else if (is("quot")) '"'
    else if (len >= 2 && s(from) == '#' && (s(from + 1) == 'x' || s(from + 1) == 'X')) {
      var v = 0L
      var k = from + 2
      if (k >= to) return -1
      while (k < to) {
        val b = s(k)
        val d =
          if (b >= '0' && b <= '9') b - '0'
          else if (b >= 'a' && b <= 'f') b - 'a' + 10
          else if (b >= 'A' && b <= 'F') b - 'A' + 10
          else return -1
        v = v * 16 + d
        if (v > Int.MaxValue) return -1 // Integer.parseInt would overflow
        k += 1
      }
      if (Character.isValidCodePoint(v.toInt)) v.toInt else -1
    } else if (len >= 1 && s(from) == '#') {
      var v = 0L
      var k = from + 1
      if (k >= to) return -1
      while (k < to) {
        val b = s(k)
        if (b < '0' || b > '9') return -1
        v = v * 10 + (b - '0')
        if (v > Int.MaxValue) return -1
        k += 1
      }
      if (Character.isValidCodePoint(v.toInt)) v.toInt else -1
    } else -1
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
