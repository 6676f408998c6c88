"""Deterministic synthetic `pages` table generator (FIXTURES.md §1).

Produces the input_hint shape (BASELINE.json:15):
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string
with the golden `text` column computed by the INDEPENDENT sequential
oracle (fixtures/make_golden.py), never by the engine under test.

Determinism: everything derives from one numpy Generator seeded by the
caller (default 42).  Knobs exercise every engine feature: zipfian
crawl-frequency skew (salting), mixed encodings + BOMs (transcode),
ill-formed byte injection (U+FFFD policy), out-of-order timestamps
(within-partition sort), lang flips (lang-stability lags), inter-crawl
gap mixture (sessionization, G=24h).
"""

from __future__ import annotations

import numpy as np

_VOCAB = {
    "en": "the quick brown fox jumps over lazy dog and runs far away home".split(),
    "de": "der schnelle braune Fuchs springt über den faulen Hund straße größe".split(),
    "es": "el zorro marrón rápido salta sobre perro perezoso mañana niño".split(),
    "fr": "le renard brun rapide saute par-dessus chien paresseux été être".split(),
    "zh": "敏捷 的 棕色 狐狸 跳过 懒惰 的 狗 然后 回家 了 再见".split(),
}
_LANGS = sorted(_VOCAB)

# ill-formed byte cases injected mid-body (SURVEY.md §2.1 table)
_BAD_BYTES = [
    b"\xc0\xaf", b"\xe0\x80\x80", b"\xed\xa0\x80", b"\xf4\x90\x80\x80",
    b"\xe2\x82", b"\x80", b"\xc2", b"\xf8\x88\x80\x80\x80", b"\xff",
]
_ENTITIES = ["&amp;", "&lt;", "&gt;", "&#65;", "&#x20AC;", "&quot;"]

_EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")


def generate_pages(
    n_urls: int = 100,
    max_crawls: int = 10,
    seed: int = 42,
    *,
    encodings: tuple[str, ...] = ("utf-8", "utf-8", "utf-8", "utf-16le", "utf-16be", "utf-32le"),
    bad_frac: float = 0.05,
    flip_frac: float = 0.10,
    out_of_order_frac: float = 0.01,
    hot_url_frac: float = 0.0,
):
    """Return a pandas DataFrame (url, warc_ts, html, text, lang).

    ``hot_url_frac`` > 0 routes that fraction of ALL crawls to url 0
    on top of the zipf skew (bench-scale skew stress).
    """
    import pandas as pd

    from fixtures.make_golden import golden_extract

    rng = np.random.default_rng(seed)

    # crawl counts: zipf(a=1.5) clipped to [1, max_crawls]
    counts = np.minimum(rng.zipf(1.5, size=n_urls), max_crawls).astype(np.int64)
    if hot_url_frac > 0:
        extra = int(counts.sum() * hot_url_frac / (1 - hot_url_frac))
        counts[0] += extra
    total = int(counts.sum())
    url_idx = np.repeat(np.arange(n_urls), counts)
    urls = np.array([f"https://site{i % 97}.example/p/{i}" for i in range(n_urls)])

    # timestamps: per-url start + cumulative mixed gaps
    start = rng.integers(0, 86400 * 30, size=n_urls) * 1_000_000  # ≤30d jitter, µs
    gap_kind = rng.integers(0, 3, size=total)
    gaps = np.where(
        gap_kind == 0, rng.integers(60, 3600, size=total),          # minutes-scale
        np.where(gap_kind == 1, rng.integers(3600, 86400, size=total),   # hours
                 rng.integers(86400, 86400 * 7, size=total)),            # days
    ).astype(np.int64) * 1_000_000
    # cumulative within url
    first_of_url = np.zeros(total, dtype=bool)
    first_of_url[np.cumsum(counts)[:-1]] = True
    first_of_url[0] = True
    cum = np.cumsum(gaps)
    base = np.repeat(cum[np.flatnonzero(first_of_url)] - gaps[first_of_url], counts)
    rel = cum - base - gaps  # first crawl of each url at +0
    ts = _EPOCH_2024 + (np.repeat(start, counts) + rel).astype("timedelta64[us]")
    # out-of-order injection: swap a few adjacent same-url pairs
    n_swap = int(total * out_of_order_frac)
    if n_swap:
        cand = np.flatnonzero(~first_of_url)
        swap = rng.choice(cand, size=min(n_swap, len(cand)), replace=False)
        ts[swap - 1], ts[swap] = ts[swap].copy(), ts[swap - 1].copy()

    # language: stable per url, ~flip_frac of multi-crawl urls flip once
    lang_of_url = rng.integers(0, len(_LANGS), size=n_urls)
    lang_idx = np.repeat(lang_of_url, counts)
    flip_urls = np.flatnonzero((rng.random(n_urls) < flip_frac) & (counts >= 2))
    crawl_no = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    for u in flip_urls:
        rows = np.flatnonzero(url_idx == u)
        k = rng.integers(1, counts[u])
        lang_idx[rows[k:]] = (lang_of_url[u] + 1) % len(_LANGS)

    enc_choice = rng.integers(0, len(encodings), size=total)
    bad_mask = rng.random(total) < bad_frac
    ent_mask = rng.random(total) < 0.3
    n_words = rng.integers(5, 30, size=total)

    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    for i in range(total):
        lang = _LANGS[lang_idx[i]]
        vocab = _VOCAB[lang]
        words = [vocab[j] for j in rng.integers(0, len(vocab), size=n_words[i])]
        if ent_mask[i]:
            words.insert(int(rng.integers(0, len(words))), _ENTITIES[rng.integers(0, len(_ENTITIES))])
        title = " ".join(vocab[j] for j in rng.integers(0, len(vocab), size=2))
        body = " ".join(words)
        html_str = (
            f"<html><head><title>{title}</title><style>s{{color:red}}</style></head>"
            f"<body><p>{body}</p><script>var x=1;</script></body></html>"
        )
        enc = encodings[enc_choice[i]]
        if enc == "utf-8":
            raw = html_str.encode("utf-8")
            if bad_mask[i]:
                bad = _BAD_BYTES[int(rng.integers(0, len(_BAD_BYTES)))]
                cut = raw.find(b"<p>") + 3
                raw = raw[:cut] + bad + raw[cut:]
            decoded = raw.decode("utf-8", errors="replace")
        else:
            codec = {"utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
                     "utf-32le": "utf-32-le", "utf-32be": "utf-32-be"}[enc]
            bom = {"utf-16le": b"\xff\xfe", "utf-16be": b"\xfe\xff",
                   "utf-32le": b"\xff\xfe\x00\x00", "utf-32be": b"\x00\x00\xfe\xff"}[enc]
            raw = bom + html_str.encode(codec)
            decoded = html_str
        htmls.append(raw)
        texts.append(golden_extract(decoded))
        langs.append(lang)

    df = pd.DataFrame(
        {
            "url": urls[url_idx],
            "warc_ts": pd.Series(ts),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )
    return df


def write_pages(path: str, **kwargs) -> str:
    """Generate and write pages.parquet; returns the file path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = generate_pages(**kwargs)
    table = pa.Table.from_pandas(df, preserve_index=False)
    # force binary (not string) for html and µs timestamps
    schema = pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("warc_ts", pa.timestamp("us")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )
    table = table.cast(schema)
    pq.write_table(table, path)
    return path
