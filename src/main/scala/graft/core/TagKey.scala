package graft.core

/**
 * Wikipedia-tag key normalization (SURVEY.md §1.7, §1.2-1): the reference
 * joins OSM `wikipedia=lang:Title` tag values against article titles after
 * normalizing both sides [PK]. The key is a pure function of (lang, raw):
 *
 *   percent-decode -> '_' -> ' ' -> trim + collapse whitespace ->
 *   uppercase first code point (MediaWiki first-letter rule) ->
 *   "lang:title".
 *
 * Also classifies malformed raw tag values (SURVEY.md §1.2-2): they must
 * route to the error output, never silently join.
 */
object TagKey {

  /** Percent-decode UTF-8 %XX sequences; malformed escapes pass through. */
  def percentDecode(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        bytes += ((hexVal(s.charAt(i + 1)) << 4) | hexVal(s.charAt(i + 2))).toByte
        i += 3
      } else {
        bytes ++= c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        i += 1
      }
    }
    new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  @inline private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  @inline private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10

  /** Title normalization without the lang prefix. */
  def normalizeTitle(raw: String): String = {
    val decoded = percentDecode(raw)
    val spaced = decoded.replace('_', ' ')
    val collapsed = spaced.replaceAll("\\s+", " ").trim
    if (collapsed.isEmpty) collapsed
    else {
      val first = collapsed.codePointAt(0)
      val up = Character.toUpperCase(first)
      new String(Character.toChars(up)) + collapsed.substring(Character.charCount(first))
    }
  }

  /** Full join key. Locale.ROOT keeps the key deterministic across JVM
    * default locales (Turkish 'I' would otherwise lowercase to U+0131). */
  def normalize(lang: String, raw: String): String =
    lang.trim.toLowerCase(java.util.Locale.ROOT) + ":" + normalizeTitle(raw)

  // --- malformed-tag classification (SURVEY.md §1.2-2) ---

  val OK = "ok"
  val ErrUrl = "url_value"          // value is a full wikipedia URL
  val ErrMissingLang = "missing_lang" // no `lang:` prefix
  val ErrBadLang = "bad_lang"       // prefix present but not a plausible code
  val ErrEmpty = "empty"

  private val langRe = "^[a-z]{2,3}(-[a-z]+)?$".r

  /** Classify a raw `wikipedia=*` value; OK iff it parses as lang:Title. */
  def classify(raw: String): String = {
    val v = raw.trim
    if (v.isEmpty) ErrEmpty
    else if (v.startsWith("http://") || v.startsWith("https://")) ErrUrl
    else {
      val idx = v.indexOf(':')
      if (idx <= 0 || idx == v.length - 1) ErrMissingLang
      else {
        val lang = v.substring(0, idx).toLowerCase(java.util.Locale.ROOT)
        if (langRe.findFirstIn(lang).isDefined) OK else ErrBadLang
      }
    }
  }

  /** Parse a raw value into a normalized key; None when malformed. */
  def parse(raw: String): Option[String] = {
    if (classify(raw) != OK) None
    else {
      val v = raw.trim
      val idx = v.indexOf(':')
      Some(normalize(v.substring(0, idx), v.substring(idx + 1)))
    }
  }
}
