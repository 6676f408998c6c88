"""Vectorized HTML → text extraction (FIXTURES.md §3 spec, frozen v1).

Spec (deterministic so "byte-identical extracted text per url",
BASELINE.json:15, is testable; re-align to the reference when the
mount is populated — SURVEY.md §0.1 item 5). The stages apply in
order, each to the output of the previous one:

1. drop ``<script…>…</script…>`` and ``<style…>…</style…>`` blocks
   inclusive (case-insensitive tag names; unclosed block runs to end
   of document; overlapping blocks union);
2. strip every other ``<…>`` tag (unclosed ``<`` consumes to end of
   document; a bare ``>`` is literal text);
3. decode exactly ``&amp; &lt; &gt; &quot; &apos; &#NNN; &#xHH;`` on
   the tag-stripped text (≤ 8 chars between ``&`` and ``;``; numeric
   value ≤ U+10FFFF and not a surrogate; anything else stays literal);
4. collapse every run of ``[ \\t\\r\\n]`` — including whitespace
   produced by step 3 — to one space;
5. strip leading/trailing space.

Implementation is staged vectorized passes over the whole Arrow batch
(no per-row Python): tag spans by pairing ``<`` with the next ``>``
(searchsorted), block union via a ±1 delta array + cumsum, entity
parse via an (n_entities × 8) gather matrix on the tag-stripped
stream, whitespace collapse via shifted masks over emitted units.
The independent sequential oracle is fixtures/make_golden.py; the two
are hypothesis-fuzzed against each other (tests/test_extract.py).
"""

from __future__ import annotations

import numpy as np

_I64 = np.int64
_U8 = np.uint8

_WS = (0x20, 0x09, 0x0D, 0x0A)
_NAMED = {b"amp": 0x26, b"lt": 0x3C, b"gt": 0x3E, b"quot": 0x22, b"apos": 0x27}


def _lower(a: np.ndarray) -> np.ndarray:
    return np.where((a >= 0x41) & (a <= 0x5A), a | 0x20, a)


def _utf8_len(cp: np.ndarray) -> np.ndarray:
    n = np.ones(len(cp), dtype=_I64)
    n += cp >= 0x80
    n += cp >= 0x800
    n += cp >= 0x10000
    return n


def _strip_tags(b: np.ndarray, offsets: np.ndarray):
    """Stages 1+2: boolean `removed` mask over the flat buffer.  All
    work happens at the sparse '<'/'>' positions; row ends are resolved
    for those positions only (searchsorted on the n+1 offsets) instead
    of materializing a per-byte row_end array."""
    total = len(b)
    lt = np.flatnonzero(b == 0x3C)                      # '<'
    delta = np.zeros(total + 1, dtype=np.int32)
    if not len(lt):
        return np.zeros(total, dtype=bool)
    # row end of each '<' position (sparse — replaces the dense gather)
    re_lt = offsets[np.searchsorted(offsets, lt, side="right")]
    gt = np.flatnonzero(b == 0x3E)                      # '>'
    if len(gt):
        gi = np.searchsorted(gt, lt)
        close = np.where(gi < len(gt), gt[np.minimum(gi, len(gt) - 1)], total)
    else:
        close = np.full(len(lt), total, dtype=_I64)
    tag_end = np.minimum(close + 1, re_lt)              # clamp unclosed to row end

    def name_match(name: bytes, closing: bool):
        off = 2 if closing else 1
        m = np.ones(len(lt), dtype=bool)
        if closing:
            nxt = lt + 1
            ok = nxt < re_lt
            m &= ok
            m[ok] &= b[nxt[ok]] == 0x2F
        else:
            nxt = lt + 1
            ok = nxt < re_lt
            m &= ok
            m[ok] &= b[nxt[ok]] != 0x2F
        for k, ch in enumerate(name):
            idx = lt + off + k
            ok = idx < re_lt
            m &= ok
            good = m.copy()
            m[good] &= _lower(b[idx[good]].astype(np.int16)) == ch
        idx = lt + off + len(name)
        ok = idx < re_lt
        m &= ok
        good = m.copy()
        term = b[idx[good]]
        m[good] &= ((term == 0x3E) | (term == 0x2F) | (term == 0x20)
                    | (term == 0x09) | (term == 0x0D) | (term == 0x0A))
        return m

    np.add.at(delta, lt, 1)
    np.add.at(delta, tag_end, -1)
    for name in (b"script", b"style"):
        opens = name_match(name, closing=False)
        closes = name_match(name, closing=True)
        o = lt[opens]
        if not len(o):
            continue
        c_starts = lt[closes]
        c_ends = tag_end[closes]
        if len(c_starts):
            ci = np.searchsorted(c_starts, o)
            blk_end = np.where(
                ci < len(c_starts), c_ends[np.minimum(ci, len(c_ends) - 1)], total
            )
        else:
            blk_end = np.full(len(o), total, dtype=_I64)
        blk_end = np.minimum(blk_end, re_lt[opens])
        np.add.at(delta, o, 1)
        np.add.at(delta, blk_end, -1)
    return np.cumsum(delta[:total], dtype=np.int32) > 0


def _parse_entities(s: np.ndarray, row_end: np.ndarray):
    """Stage 3 on the tag-stripped stream.  Returns
    (ent_pos '&' indices, ent_cp, ent_stop index-after-';')."""
    total = len(s)
    amp = np.flatnonzero(s == 0x26)
    if not len(amp):
        z = np.zeros(0, dtype=_I64)
        return z, z, z
    semi = np.flatnonzero(s == 0x3B)
    if not len(semi):
        z = np.zeros(0, dtype=_I64)
        return z, z, z
    si = np.searchsorted(semi, amp)
    q = np.where(si < len(semi), semi[np.minimum(si, len(semi) - 1)], total)
    blen = q - amp - 1
    cand = (si < len(semi)) & (q < row_end[amp]) & (blen >= 1) & (blen <= 8)

    body = np.full((len(amp), 8), -1, dtype=np.int16)
    for k in range(8):
        ok = cand & (k < blen)
        body[ok, k] = s[amp[ok] + 1 + k]

    ent_cp = np.zeros(len(amp), dtype=np.int64)
    ent_ok = np.zeros(len(amp), dtype=bool)
    for name, cpv in _NAMED.items():
        m = cand & (blen == len(name))
        for k, ch in enumerate(name):
            m &= body[:, k] == ch
        ent_cp[m] = cpv
        ent_ok |= m
    isnum = cand & (body[:, 0] == 0x23) & (blen >= 2)
    hexm = isnum & ((body[:, 1] == 0x78) | (body[:, 1] == 0x58)) & (blen >= 3)
    decm = isnum & ~hexm
    for m, base, dstart in ((decm, 10, 1), (hexm, 16, 2)):
        if not m.any():
            continue
        val = np.zeros(len(amp), dtype=np.int64)
        good = m.copy()
        for k in range(dstart, 8):
            active = good & (k < blen)
            d = body[:, k]
            dv = np.full(len(amp), -1, dtype=np.int64)
            dig = (d >= 0x30) & (d <= 0x39)
            dv[dig] = d[dig] - 0x30
            if base == 16:
                dl = _lower(d)
                hx = (dl >= 0x61) & (dl <= 0x66)
                dv[hx] = dl[hx] - 0x61 + 10
            good &= ~(active & (dv < 0))
            upd = good & active
            val[upd] = np.minimum(val[upd] * base + dv[upd], 0x7FFFFFFF)
        good &= (val <= 0x10FFFF) & ~((val >= 0xD800) & (val < 0xE000))
        ent_cp[good] = val[good]
        ent_ok |= good
    return amp[ent_ok], ent_cp[ent_ok], (q + 1)[ent_ok]


def _gather_rows(s: np.ndarray, s_off: np.ndarray, rows: np.ndarray):
    """Sub-stream of selected rows (bounded per-row memcpy)."""
    lens = s_off[rows + 1] - s_off[rows]
    sub_off = np.zeros(len(rows) + 1, dtype=_I64)
    np.cumsum(lens, out=sub_off[1:])
    sub = np.empty(int(sub_off[-1]), dtype=_U8)
    for j, r in enumerate(rows):
        sub[sub_off[j]:sub_off[j + 1]] = s[s_off[r]:s_off[r + 1]]
    return sub, sub_off


def extract_text(data: np.ndarray, offsets: np.ndarray):
    """(utf-8 text data, offsets) → (extracted data, offsets)."""
    n = len(offsets) - 1
    total = int(offsets[-1])
    empty_off = np.zeros(n + 1, dtype=_I64)
    if total == 0:
        return np.empty(0, dtype=_U8), empty_off

    b = np.ascontiguousarray(data[:total])

    # ---- stages 1+2 → compact stream s ---------------------------------
    removed = _strip_tags(b, offsets)
    keep = ~removed
    s = b[keep]
    # per-row kept counts via reduceat over non-empty row starts (no
    # dense per-byte row_of/row_end arrays — round 1 materialized both)
    row_lens = np.diff(offsets)
    nonempty = np.flatnonzero(row_lens > 0)
    kept_counts = np.zeros(n, dtype=_I64)
    if len(nonempty):
        kept_counts[nonempty] = np.add.reduceat(
            keep, offsets[:-1][nonempty], dtype=_I64)
    s_off = np.zeros(n + 1, dtype=_I64)
    np.cumsum(kept_counts, out=s_off[1:])

    if not len(s):
        return np.empty(0, dtype=_U8), empty_off

    # ---- row split on entity presence ----------------------------------
    # One '&' anywhere used to drag the WHOLE batch through the general
    # (entity) splice, ~4× slower than the fast path.  Rows are
    # independent, so split: entity-free rows take the fast path,
    # entity rows the general one, outputs stitched back by row id.
    if (s == 0x26).any():
        amp_counts = np.zeros(n, dtype=_I64)
        has_kept = np.flatnonzero(kept_counts > 0)
        if len(has_kept):
            amp_counts[has_kept] = np.add.reduceat(
                s == 0x26, s_off[:-1][has_kept], dtype=_I64)
        rows_b = np.flatnonzero(amp_counts > 0)
        if 0 < len(rows_b) <= (3 * n) // 4 and n >= 8:
            rows_a = np.flatnonzero(amp_counts == 0)
            sA, offA_in = _gather_rows(s, s_off, rows_a)
            sB, offB_in = _gather_rows(s, s_off, rows_b)
            outA, offA = _process_units(sA, offA_in, len(rows_a))
            outB, offB = _process_units(sB, offB_in, len(rows_b))
            out_lens = np.zeros(n, dtype=_I64)
            out_lens[rows_a] = np.diff(offA)
            out_lens[rows_b] = np.diff(offB)
            out_offsets = np.zeros(n + 1, dtype=_I64)
            np.cumsum(out_lens, out=out_offsets[1:])
            out = np.empty(int(out_offsets[-1]), dtype=_U8)
            for j, r in enumerate(rows_a):
                out[out_offsets[r]:out_offsets[r + 1]] = outA[offA[j]:offA[j + 1]]
            for j, r in enumerate(rows_b):
                out[out_offsets[r]:out_offsets[r + 1]] = outB[offB[j]:offB[j + 1]]
            return out, out_offsets
    return _process_units(s, s_off, n)


def _process_units(s: np.ndarray, s_off: np.ndarray, n: int):
    """Stages 3–5 over a compacted (tag-stripped) stream: entity parse,
    whitespace collapse, edge strip, splice.  Row-aligned: returns
    (out bytes, out_offsets[n+1])."""
    empty_off = np.zeros(n + 1, dtype=_I64)
    if not len(s):
        return np.empty(0, dtype=_U8), empty_off
    # int32 position indices are ~2× faster on the pure-memory-traffic
    # unit stages, but wrap silently past 2 GiB — guard once here (like
    # encode.py/buffers.py) instead of trusting the Arrow-batch-size
    # convention (ADVICE r2).
    idx_t = np.int32 if len(s) + 2 < 2**31 else _I64
    s_row = np.repeat(np.arange(n, dtype=_I64), np.diff(s_off))

    # ---- stage 3: entities on s ----------------------------------------
    # gate on a single compare pass: batches with no '&' at all (most
    # real crawl batches) skip the entity scan entirely
    if (s == 0x26).any():
        s_row_end = s_off[1:][s_row]
        ent_pos, ent_cpv, ent_stop = _parse_entities(s, s_row_end)
    else:
        ent_pos = ent_cpv = ent_stop = np.empty(0, dtype=np.int64)

    have_ents = bool(len(ent_pos))
    if have_ents:
        d2 = np.zeros(len(s) + 1, dtype=np.int32)
        np.add.at(d2, ent_pos + 1, 1)                   # body after '&'
        np.add.at(d2, ent_stop, -1)
        consumed = np.cumsum(d2[:len(s)], dtype=np.int32) > 0
        consumed[ent_pos] = False                        # '&' itself emits
        # idx_t indices throughout (int32 below 2 GiB, guarded above) —
        # the unit stage is pure memory traffic, so index width is the cost
        unit_idx = np.flatnonzero(~consumed).astype(idx_t)
        U = len(unit_idx)
        ubyte = s[unit_idx]  # stays uint8
    else:
        # every byte is a unit: skip the flatnonzero + gathers (three
        # full-array passes of pure memory traffic)
        U = len(s)
        ubyte = s
    if U == 0:
        return np.empty(0, dtype=_U8), empty_off

    if have_ents:
        is_ent = np.zeros(U, dtype=bool)
        loc = np.searchsorted(unit_idx, ent_pos)
        is_ent[loc] = True
        unit_cp = np.full(U, -1, dtype=np.int64)
        unit_cp[loc] = ent_cpv

    def _ws_mask(a: np.ndarray) -> np.ndarray:
        # explicit ORs — np.isin is sort-based and dominates the whole
        # kernel on MB-scale arrays
        return (a == 0x20) | (a == 0x09) | (a == 0x0D) | (a == 0x0A)

    u_is_ws = _ws_mask(ubyte)
    if have_ents:
        u_is_ws = (u_is_ws & ~is_ent) | (is_ent & _ws_mask(unit_cp))

    # ---- stages 4+5: collapse + strip over the unit sequence -----------
    urow = s_row[unit_idx] if have_ents else s_row
    new_row = np.zeros(U, dtype=bool)
    new_row[0] = True
    new_row[1:] = urow[1:] != urow[:-1]
    prev_ws = np.zeros(U, dtype=bool)
    prev_ws[1:] = u_is_ws[:-1]
    prev_ws[new_row] = False
    ws_keep = u_is_ws & ~prev_ws

    # Per-row first/last non-ws WITHOUT a per-unit row_seq cumsum +
    # gather (the two slowest passes of round 1's formulation): the
    # sorted non-ws position list + a searchsorted against the 500-ish
    # row starts gives the bounds, and np.repeat broadcasts them back.
    uidx = np.arange(U, dtype=idx_t)
    row_unit_starts = np.flatnonzero(new_row)
    nw = np.flatnonzero(~u_is_ws)                       # sorted non-ws positions
    seg_bounds = np.append(row_unit_starts, U)
    seg_len = np.diff(seg_bounds)
    if len(nw):
        lo = np.searchsorted(nw, seg_bounds[:-1])       # per row: first nw idx
        hi = np.searchsorted(nw, seg_bounds[1:]) - 1    # per row: last nw idx
        has_nw = lo <= hi
        first_nonws = np.where(has_nw, nw[np.minimum(lo, len(nw) - 1)],
                               U + 1).astype(idx_t)
        last_nonws = np.where(has_nw, nw[np.maximum(hi, 0)], -1).astype(idx_t)
        ws_keep &= (uidx > np.repeat(first_nonws, seg_len)) \
            & (uidx < np.repeat(last_nonws, seg_len))
    else:
        ws_keep[:] = False                              # all-whitespace batch

    if not have_ents:
        # fast splice: every emitted unit is exactly one byte — scatter
        # spaces in place, one compress, offsets via per-ROW emit sums
        # (reduceat over ~500 segments, not a 5M-element cumsum)
        emit = ~u_is_ws | ws_keep
        w = ubyte.copy()
        w[ws_keep] = 0x20
        out = w[emit]
        counts = np.zeros(n, dtype=_I64)
        counts[urow[row_unit_starts]] = np.add.reduceat(
            emit, row_unit_starts, dtype=_I64)
        out_offsets = np.zeros(n + 1, dtype=_I64)
        np.cumsum(counts, out=out_offsets[1:])
        return out, out_offsets

    unit_row_counts = np.bincount(urow, minlength=n)
    row_unit_end = np.cumsum(unit_row_counts)

    # ---- general splice (entities present) ------------------------------
    out_len = np.zeros(U, dtype=np.int32)
    plain = ~u_is_ws & ~is_ent
    out_len[plain] = 1
    out_len[ws_keep] = 1
    ent_emit = is_ent & ~u_is_ws
    out_len[ent_emit] = _utf8_len(unit_cp[ent_emit])

    opos = np.zeros(U + 1, dtype=np.int32 if U * 4 < 2**31 else _I64)
    np.cumsum(out_len, out=opos[1:])
    out = np.empty(int(opos[-1]), dtype=_U8)
    out[opos[:-1][plain]] = ubyte[plain]
    out[opos[:-1][ws_keep]] = 0x20
    if ent_emit.any():
        ecp = unit_cp[ent_emit]
        ep = opos[:-1][ent_emit]
        el = out_len[ent_emit]
        m1 = el == 1
        out[ep[m1]] = ecp[m1]
        m2 = el == 2
        out[ep[m2]] = 0xC0 | (ecp[m2] >> 6)
        out[ep[m2] + 1] = 0x80 | (ecp[m2] & 0x3F)
        m3 = el == 3
        out[ep[m3]] = 0xE0 | (ecp[m3] >> 12)
        out[ep[m3] + 1] = 0x80 | ((ecp[m3] >> 6) & 0x3F)
        out[ep[m3] + 2] = 0x80 | (ecp[m3] & 0x3F)
        m4 = el == 4
        out[ep[m4]] = 0xF0 | (ecp[m4] >> 18)
        out[ep[m4] + 1] = 0x80 | ((ecp[m4] >> 12) & 0x3F)
        out[ep[m4] + 2] = 0x80 | ((ecp[m4] >> 6) & 0x3F)
        out[ep[m4] + 3] = 0x80 | (ecp[m4] & 0x3F)

    out_offsets = np.zeros(n + 1, dtype=_I64)
    out_offsets[1:] = opos[row_unit_end]
    return out, out_offsets
