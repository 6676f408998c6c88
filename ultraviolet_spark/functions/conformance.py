"""Driver-visible conformance cases for the transcoding core.

Round-1 gap (VERDICT "What's missing" #1): utf8_validate, decode-replace,
detect_bom, codepoint_classify and HTML extraction — the engine's core
semantics — had zero rows in the driver's CORRECTNESS gate.  These cases
turn the SURVEY.md §2.1 golden table (and the extraction spec) into
oracle-checked queries: the Spark side runs the real kernels over a
literal byte-cases table; the DuckDB oracle is a VALUES list whose
expected outputs are computed HERE, at import time, by the independent
oracles (CPython codecs / fixtures.make_golden.golden_extract) — never by
the kernels under test.
"""

from __future__ import annotations

import codecs

# SURVEY.md §2.1 golden classes (same byte cases as
# tests/test_utf8_conformance.py — kept literal so the query is
# self-contained and deterministic).
UTF8_CASES: list[tuple[str, bytes]] = [
    ("ascii", b"hello"),
    ("empty", b""),
    ("valid_2byte", b"\xc3\xa9"),
    ("valid_3byte", b"\xe2\x82\xac"),
    ("valid_4byte_astral", b"\xf0\x9f\x92\xa9"),
    ("overlong_slash", b"\xc0\xaf"),
    ("overlong_nul", b"\xe0\x80\x80"),
    ("overlong_4byte", b"\xf0\x80\x80\x80"),
    ("surrogate_d800", b"\xed\xa0\x80"),
    ("surrogate_dfff", b"\xed\xbf\xbf"),
    ("above_10ffff", b"\xf4\x90\x80\x80"),
    ("truncated_3byte", b"\xe2\x82"),
    ("truncated_4byte", b"\xf0\x9f\x92"),
    ("lone_continuation", b"\x80"),
    ("lone_lead_2", b"\xc2"),
    ("lone_lead_4", b"\xf0"),
    ("illegal_5byte", b"\xf8\x88\x80\x80\x80"),
    ("fe", b"\xfe"),
    ("ff", b"\xff"),
    ("mixed", b"ok\xc3\xa9\x80end\xf0\x9f\x92"),
    ("nul_embedded", b"a\x00b"),
    ("bom_as_content", b"\xef\xbb\xbfhi"),
    ("truncated_then_valid", b"\xe2\x82\xc3\xa9"),
    ("f0_then_bad_cont", b"\xf0\x9f\xc3\xa9"),
    ("ed_9f_bf_valid", b"\xed\x9f\xbf"),
    ("ee_80_80_valid", b"\xee\x80\x80"),
    ("c0", b"\xc0"),
    ("c1_bf", b"\xc1\xbf"),
    ("e0_9f_80", b"\xe0\x9f\x80"),
    ("f4_8f_bf_bf", b"\xf4\x8f\xbf\xbf"),
]

BOM_CASES: list[tuple[str, bytes]] = [
    ("utf8_bom", codecs.BOM_UTF8 + b"hello"),
    ("utf16le_bom", codecs.BOM_UTF16_LE + b"h\x00i\x00"),
    ("utf16be_bom", codecs.BOM_UTF16_BE + b"\x00h\x00i"),
    ("utf32le_bom", codecs.BOM_UTF32_LE + b"h\x00\x00\x00"),
    ("utf32be_bom", codecs.BOM_UTF32_BE + b"\x00\x00\x00h"),
    ("bare_16le_bom", codecs.BOM_UTF16_LE),
    # ff fe 00 00: utf-32le BOM must win over its utf-16le prefix
    ("ambiguous_32le", codecs.BOM_UTF32_LE),
    ("no_bom", b"plain ascii"),
    ("empty", b""),
    ("almost_utf8_bom", b"\xef\xbb"),
    ("fe_ff_reversed_tail", b"\xbb\xbf\xef"),
]

EXTRACT_CASES: list[tuple[str, str]] = [
    ("plain", "just words here"),
    ("simple_tags", "<html><body><p>Hello <b>world</b></p></body></html>"),
    ("script_dropped", "<p>keep</p><script>var x = '<b>no</b>';</script><p>also</p>"),
    ("style_dropped", "<style>p { color: red }</style><div>visible</div>"),
    ("comment_dropped", "before<!-- hidden <b>bold</b> -->after"),
    ("entities", "&amp;&lt;&gt;&quot; &#65;&#x42; &#x20AC; &euro;"),
    ("nested_whitespace", "<div>\n  <p>  spaced   out  </p>\n</div>"),
    ("attrs_with_gt", '<a href="x>y" title=\'a<b\'>link</a>'),
    ("unclosed", "<p>open paragraph"),
    ("empty", ""),
    ("only_tags", "<br/><hr><img src='x'/>"),
    ("mixed_case_script", "<SCRIPT>alert(1)</SCRIPT>text<Br>more"),
    ("numeric_entity_astral", "&#128169; pile"),
    ("bad_entity", "&notreal; &#xZZ; &# ;"),
    ("cdata_like", "a <![CDATA[ raw ]]> b"),
]


def sql_str(s: str) -> str:
    """A DuckDB VARCHAR expression for arbitrary text: quoted runs
    concatenated with chr(n) for control chars and quotes."""
    if s == "":
        return "''"
    parts: list[str] = []
    run: list[str] = []

    def flush():
        if run:
            parts.append("'" + "".join(run) + "'")
            run.clear()

    for ch in s:
        if ord(ch) < 0x20 or ch == "'":
            flush()
            parts.append(f"chr({ord(ch)})")
        else:
            run.append(ch)
    flush()
    return " || ".join(parts)


def expected_utf8(raw: bytes):
    """(valid, error_offset, n_repl, decoded) per CPython — the
    independent oracle (SURVEY.md §0: CPython codecs are normative
    while the reference mount is empty)."""
    decoded = raw.decode("utf-8", errors="replace")
    n_repl = decoded.count("�") - raw.decode("utf-8", "ignore").count("�")
    try:
        raw.decode("utf-8", errors="strict")
        return True, -1, n_repl, decoded
    except UnicodeDecodeError as e:
        return False, e.start, n_repl, decoded


def expected_bom(raw: bytes) -> str:
    """BOM precedence per the public Unicode spec: longest match wins
    (UTF-32 BOMs contain UTF-16 BOMs as prefixes)."""
    if raw.startswith(codecs.BOM_UTF32_LE):
        return "utf-32le"
    if raw.startswith(codecs.BOM_UTF32_BE):
        return "utf-32be"
    if raw.startswith(codecs.BOM_UTF8):
        return "utf-8"
    if raw.startswith(codecs.BOM_UTF16_LE):
        return "utf-16le"
    if raw.startswith(codecs.BOM_UTF16_BE):
        return "utf-16be"
    return "none"


def utf8_cases_oracle_sql() -> str:
    rows = []
    for cid, raw in UTF8_CASES:
        valid, off, n_repl, decoded = expected_utf8(raw)
        rows.append(f"({sql_str(cid)}, {str(valid).lower()}, "
                    f"CAST({off} AS BIGINT), CAST({n_repl} AS BIGINT), "
                    f"{sql_str(decoded)})")
    return ("SELECT * FROM (VALUES " + ", ".join(rows)
            + ") AS t(case_id, valid, error_offset, n_repl, decoded)")


def bom_cases_oracle_sql() -> str:
    rows = [f"({sql_str(cid)}, {sql_str(expected_bom(raw))})"
            for cid, raw in BOM_CASES]
    return ("SELECT * FROM (VALUES " + ", ".join(rows)
            + ") AS t(case_id, bom)")


def extract_cases_oracle_sql() -> str:
    from fixtures.make_golden import golden_extract

    rows = [f"({sql_str(cid)}, {sql_str(golden_extract(html))})"
            for cid, html in EXTRACT_CASES]
    return ("SELECT * FROM (VALUES " + ", ".join(rows)
            + ") AS t(case_id, extracted)")


# UTF-16 / UTF-32 ill-formed classes (SURVEY.md §2.1 last two rows +
# boundary cases).  (case_id, encoding, raw bytes); expected text is
# CPython's errors='replace' decode of the same bytes.
WIDE_CASES: list[tuple[str, str, bytes]] = [
    ("u16le_lone_high_then_A", "utf-16-le", b"\x00\xd8A\x00"),
    ("u16le_lone_low", "utf-16-le", b"\x00\xdc"),
    ("u16le_valid_astral_pair", "utf-16-le", "💩".encode("utf-16-le")),
    ("u16le_odd_trailing_byte", "utf-16-le", b"A\x00B"),
    ("u16be_lone_high", "utf-16-be", b"\xd8\x00\x00A"),
    ("u16be_plain", "utf-16-be", "hé".encode("utf-16-be")),
    ("u16le_swapped_pair", "utf-16-le", b"\x00\xdc\x00\xd8"),  # low before high
    ("u32le_out_of_range", "utf-32-le", b"\x00\x00\x11\x00"),
    ("u32le_surrogate_value", "utf-32-le", b"\x00\xd8\x00\x00"),
    ("u32le_valid_astral", "utf-32-le", "💩".encode("utf-32-le")),
    ("u32be_max_scalar", "utf-32-be", b"\x00\x10\xff\xff"),
    ("u32le_trailing_bytes", "utf-32-le", b"A\x00\x00\x00BC"),
    ("u16le_empty", "utf-16-le", b""),
]


def wide_cases_oracle_sql() -> str:
    rows = []
    for cid, codec, raw in WIDE_CASES:
        want = raw.decode(codec, errors="replace")
        n_repl = (want.count("�")
                  - raw.decode(codec, "ignore").count("�"))
        rows.append(f"({sql_str(cid)}, {sql_str(want)}, "
                    f"CAST({n_repl} AS BIGINT))")
    return ("SELECT * FROM (VALUES " + ", ".join(rows)
            + ") AS t(case_id, decoded, n_repl)")
