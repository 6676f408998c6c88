"""Independent slow-path oracle implementations (FIXTURES.md §1.4, §3).

These are deliberately simple sequential CPython implementations of the
frozen extraction spec (FIXTURES.md §3) and decode-with-replace
(CPython codecs ARE the normative decode oracle, SURVEY.md §0.1).
They generate golden fixtures and serve as the hypothesis fuzz oracle
for the vectorized kernels.  Never used by the engine itself.
"""

from __future__ import annotations

_WS = " \t\r\n"
_NAMED = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}


def golden_decode_utf8(raw: bytes) -> str:
    return raw.decode("utf-8", errors="replace")


def _tag_name(text: str, lt: int) -> tuple[str, bool]:
    """(lowercased name, is_closing) for the tag starting at text[lt]=='<'."""
    i = lt + 1
    closing = i < len(text) and text[i] == "/"
    if closing:
        i += 1
    j = i
    while j < len(text) and (text[j].isascii() and text[j].isalpha()):
        j += 1
    return text[i:j].lower(), closing


def _block_spans(text: str, name: str) -> list[tuple[int, int]]:
    """Spans of <name…>…</name…> blocks per the frozen spec: from each
    open tag '<' to the end of the first close-tag pattern at/after it
    (through the close tag's '>'), or end of document."""
    spans = []
    n = len(text)
    opens, closes = [], []
    for lt in _find_all(text, "<"):
        nm, closing = _tag_name(text, lt)
        # terminator required after the name
        term_i = lt + (2 if closing else 1) + len(nm)
        ok_term = term_i < n and text[term_i] in (">/" + _WS)
        if nm == name and ok_term:
            (closes if closing else opens).append(lt)
    for o in opens:
        c = next((c for c in closes if c >= o), None)
        if c is None:
            spans.append((o, n))
        else:
            gt = text.find(">", c)
            spans.append((o, n if gt == -1 else gt + 1))
    return spans


def _find_all(text: str, ch: str):
    i = text.find(ch)
    while i != -1:
        yield i
        i = text.find(ch, i + 1)


def _strip_tags(text: str) -> str:
    n = len(text)
    remove = [False] * n
    for a, b in _block_spans(text, "script") + _block_spans(text, "style"):
        for k in range(a, min(b, n)):
            remove[k] = True
    for lt in _find_all(text, "<"):
        gt = text.find(">", lt)
        end = n if gt == -1 else gt + 1
        for k in range(lt, end):
            remove[k] = True
    return "".join(c for c, r in zip(text, remove) if not r)


def _decode_entities(text: str) -> str:
    out = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c != "&":
            out.append(c)
            i += 1
            continue
        q = text.find(";", i)
        body = text[i + 1: q] if q != -1 else ""
        dec = None
        if q != -1 and 1 <= len(body) <= 8:
            if body in _NAMED:
                dec = _NAMED[body]
            elif body.startswith("#"):
                digits, base = body[1:], 10
                if digits[:1] in ("x", "X"):
                    digits, base = digits[1:], 16
                allowed = "0123456789" if base == 10 else "0123456789abcdefABCDEF"
                if digits and all(d in allowed for d in digits):
                    v = int(digits, base)
                    if v <= 0x10FFFF and not (0xD800 <= v < 0xE000):
                        dec = chr(v)
        if dec is not None:
            out.append(dec)
            i = q + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _collapse_ws(text: str) -> str:
    out = []
    prev_ws = False
    for c in text:
        if c in _WS:
            if not prev_ws:
                out.append(" ")
            prev_ws = True
        else:
            out.append(c)
            prev_ws = False
    return "".join(out).strip(" ")


def golden_extract(text: str) -> str:
    """The full frozen extraction spec, sequentially."""
    return _collapse_ws(_decode_entities(_strip_tags(text)))


def golden_pipeline(html: bytes) -> str:
    """decode-with-replace + extract — the per-row `text` oracle."""
    return golden_extract(golden_decode_utf8(html))
