#!/usr/bin/env python3
"""Stdlib-only deterministic mini-oracle (SURVEY.md §0.1-5, §5.2-3): naive
reimplementation of the engine's correctness-critical pure functions —
HTML->text extraction, tag-key normalization, cell encoding / tile
assignment, ray-cast point-in-polygon — used as a cross-LANGUAGE check
that the semantics are specified by math, not by JVM accident.

Protocol: JSON object per stdin line -> JSON result per stdout line.
  {"op":"extract","html_b64":...}          -> {"text":...}
  {"op":"normalize","lang":...,"raw":...}  -> {"key":...}
  {"op":"encode","lat":..,"lon":..,"r":..} -> {"cell":...}
  {"op":"parent","cell":..,"rp":..}        -> {"cell":...}
  {"op":"tile_xy","cell":..}               -> {"x":..,"y":..}
  {"op":"pip","lat":..,"lon":..,"rings":[[x,y,...],...]} -> {"inside":bool}
"""
import sys, json, base64, math, re, unicodedata


def java_is_whitespace(ch):
    """Character.isWhitespace semantics: Unicode space separators EXCEPT
    the non-breaking ones, plus the Java control whitespace set."""
    if ch in '\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f':
        return True
    if ch in '\xa0  ':
        return False
    return unicodedata.category(ch) in ('Zs', 'Zl', 'Zp')


def strip_tags(s):
    out = []
    i, n = 0, len(s)
    low = s.lower()
    while i < n:
        c = s[i]
        if c == '<':
            dropped = False
            for name in ("script", "style"):
                if low.startswith(name, i + 1) and (
                        i + 1 + len(name) == n or
                        not low[i + 1 + len(name)].isalnum()):
                    close = "</" + name + ">"
                    end = low.find(close, i)
                    i = n if end < 0 else end + len(close)
                    dropped = True
                    break
            if not dropped:
                gt = s.find('>', i + 1)
                i = n if gt < 0 else gt + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def decode_collapse(s):
    out = []
    pending = started = False

    def emit(ch):
        nonlocal pending, started
        if java_is_whitespace(ch):
            if started:
                pending = True
        else:
            if pending:
                out.append(' ')
                pending = False
            out.append(ch)
            started = True

    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == '&':
            semi = s.find(';', i + 1)
            if i < semi <= i + 10:
                body = s[i + 1:semi]
                rep = {"amp": "&", "lt": "<", "gt": ">", "quot": '"'}.get(body)
                if rep is None and body.startswith('#'):
                    # strict digit validation mirrors Java's parseInt: no
                    # underscores, no surrounding whitespace ('&#1_0;',
                    # '&# 12;' stay literal in both implementations)
                    if body[1:2] in 'xX' and re.fullmatch(r'[0-9a-fA-F]+', body[2:]):
                        cp = int(body[2:], 16)
                    elif re.fullmatch(r'[0-9]+', body[1:]):
                        cp = int(body[1:])
                    else:
                        cp = None
                    try:
                        rep = chr(cp) if cp is not None else None
                    except (ValueError, OverflowError):
                        rep = None
                if rep is not None:
                    for ch in rep:
                        emit(ch)
                    i = semi + 1
                    continue
        emit(c)
        i += 1
    return "".join(out)


def extract(html_bytes):
    return decode_collapse(strip_tags(html_bytes.decode("utf-8", "replace")))


def normalize(lang, raw):
    # percent-decode UTF-8 %XX (malformed escapes pass through)
    if '%' in raw:
        b, i, out = raw, 0, bytearray()
        while i < len(b):
            if b[i] == '%' and i + 2 < len(b) and \
                    b[i+1] in '0123456789abcdefABCDEF' and \
                    b[i+2] in '0123456789abcdefABCDEF':
                out.append(int(b[i+1:i+3], 16))
                i += 3
            else:
                out += b[i].encode('utf-8')
                i += 1
        raw = out.decode('utf-8', 'replace')
    # Java regex \s is ASCII-only; Java String.trim strips chars <= U+0020
    t = re.sub(r'[ \t\n\x0b\f\r]+', ' ', raw.replace('_', ' '))
    t = t.strip(''.join(chr(c) for c in range(0x21)))
    if t:
        # Java Character.toUpperCase is a SIMPLE per-codepoint mapping:
        # full mappings that expand (ß->SS, ligatures) keep the original
        up = t[0].upper()
        t = (up if len(up) == 1 else t[0]) + t[1:]
    lang_t = lang.strip(''.join(chr(c) for c in range(0x21)))
    return lang_t.lower() + ':' + t


def encode(lat, lon, r):
    n = 1 << r
    x = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
    y = min(max(int(math.floor((lat + 90.0) / 180.0 * n)), 0), n - 1)
    m = 0
    for k in range(r):
        m |= ((x >> k) & 1) << (2 * k)
        m |= ((y >> k) & 1) << (2 * k + 1)
    return (r << 56) | m


def parent(cell, rp):
    r = (cell >> 56) & 0x1f
    return (rp << 56) | ((cell & ((1 << 56) - 1)) >> (2 * (r - rp)))


def tile_xy(cell):
    r = (cell >> 56) & 0x1f
    m = cell & ((1 << 56) - 1)
    x = y = 0
    for k in range(r):
        x |= ((m >> (2 * k)) & 1) << k
        y |= ((m >> (2 * k + 1)) & 1) << k
    return x, y


def pip(lat, lon, rings):
    crossings = 0
    for ring in rings:
        pts = [(ring[2*i], ring[2*i+1]) for i in range(len(ring)//2)]
        for i in range(len(pts)):
            x1, y1 = pts[i]
            x2, y2 = pts[(i + 1) % len(pts)]
            if (y1 > lat) != (y2 > lat) and \
                    lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
                crossings += 1
    return crossings % 2 == 1


def main():
    for line in sys.stdin:
        if not line.strip():
            continue
        q = json.loads(line)
        op = q["op"]
        if op == "extract":
            r = {"text": extract(base64.b64decode(q["html_b64"]))}
        elif op == "normalize":
            r = {"key": normalize(q["lang"], q["raw"])}
        elif op == "encode":
            r = {"cell": encode(q["lat"], q["lon"], q["r"])}
        elif op == "parent":
            r = {"cell": parent(q["cell"], q["rp"])}
        elif op == "tile_xy":
            x, y = tile_xy(q["cell"])
            r = {"x": x, "y": y}
        elif op == "pip":
            r = {"inside": pip(q["lat"], q["lon"], q["rings"])}
        else:
            r = {"error": "unknown op"}
        sys.stdout.write(json.dumps(r) + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
