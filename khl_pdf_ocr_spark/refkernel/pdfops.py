"""Layout reconstruction + field extraction operators (exact semantics).

Pure functions over word tuples, reproducing the observable semantics of
the reference extractor's operators (reference file: ``app.py`` in
``/root/reference``; citations below are to that file).  They are the
per-document scalar kernel that the Spark pipeline runs inside
Arrow-batched UDFs — idiomatic DataFrame code surrounds them; these stay
in Python because two of them (greedy y-clustering, the referee
pair-accumulator) are order-dependent sequential folds whose byte-exact
output a relational rewrite cannot guarantee (SURVEY.md §7.6.1).

Conventions:
- ``words8``: MuPDF-shaped ``(x0, y0, x1, y1, text, block, line, word)``.
- ``words``: the kernel's projected ``(y, x, text)`` triple, sorted
  top-to-bottom / left-to-right  (app.py:86-94).
"""

from __future__ import annotations

import bisect
import re
from operator import itemgetter

__all__ = [
    "sort_project_words", "lines_from_words", "group_words_by_lines_and_cols",
    "find_match_meta", "find_ref_lines", "collect_goalies_from_column",
    "extract_match_from_words", "extract_refs_from_words",
    "extract_goalies_from_words", "extract_all_from_words", "extracted_text",
]

# --- compiled patterns (the regexes ARE the spec; cf. app.py:147,151,158,
#     171,204,205,210,222,288,290,295-297) -----------------------------------
RE_WS = re.compile(r"\s+")
RE_WS2 = re.compile(r"\s{2,}")
RE_DATE_NUM = re.compile(r"\b\d{2}\.\d{2}\.\d{4}\b")
RE_DATE_RU = re.compile(r"\b\d{1,2}\s+[А-Яа-яё]+\s+20\d{2}")
RE_TIME = re.compile(r"\b([01]\d|2[0-3]):[0-5]\d\b")
RE_CAPS3 = re.compile(r"[А-ЯЁ]{3,}")
RE_UPDATED = re.compile(r"Обновлено.*", re.I)
RE_REF_SPLIT = re.compile(r"[,\|;]+|\s+")
RE_NAME_TOKEN = re.compile(r"^[А-ЯЁ][а-яё\-]+$")
RE_GOALIE_NAME = re.compile(r"([А-ЯЁ][а-яё\-]+ [А-ЯЁ][а-яё\-]+(?: [А-ЯЁ][а-яё\-]+)?)")
RE_LINE_UNIT = re.compile(r"\bЗвено\s*\d")
RE_FLAG_C = re.compile(r"\bС\b")   # Cyrillic С
RE_FLAG_R = re.compile(r"\bР\b")   # Cyrillic Р

REF_HEADER_MAIN = "Главный судья"
REF_HEADER_LINE = "Линейный судья"
GOALIE_HEADER = "Вратари"

# cluster count above which lines_from_words switches from the reference's
# linear key scan (fastest for ordinary pages) to bisect pruning
# (quadratic protection for dense documents); output identical either way
_BISECT_SWITCH = 64
LINE_UNIT_PREFIX = "Звено"


def sort_project_words(words8) -> list[tuple[float, float, str]]:
    """Word scan → sort by ``(round(y,1), x)`` → project to ``(y, x, text)``.

    Semantics of ``text_words`` (app.py:86-94): stable sort (Python's
    ``sorted``), y rounded to 1 decimal only inside the key.
    """
    ws = sorted(words8, key=lambda w: (round(w[1], 1), w[0]))
    return [(w[1], w[0], w[4]) for w in ws]


def lines_from_words(words, tolerance: float = 3.0) -> list[str]:
    """Greedy first-match y-clustering → per-cluster x-sort → join.

    Semantics of app.py:97-117: each word joins the FIRST existing
    cluster (dict insertion order) whose key-y is within ``tolerance``;
    the cluster key is the y of its first word.  Clusters are emitted by
    ascending key, items sorted by x, joined with single spaces, runs of
    whitespace collapsed, empty lines dropped.  Order-dependent — this
    exact loop is the spec.

    Implementation: the reference's linear scan over existing cluster
    keys is the FASTEST choice for ordinary pages (tens of lines) — a
    bisect path measured ~8 % slower there — but it is O(words ×
    clusters), a quadratic trap on dense thousand-line documents at
    100 TB.  Hybrid: exact reference loop below ``_BISECT_SWITCH``
    clusters; above it, a bisect over the value-sorted key list prunes
    to the keys NEAR y, then the reference's exact predicate
    (``abs(ky - y) <= tolerance``) and its insertion-order tie-break
    decide.  The bisect window is widened by an epsilon so float
    rounding in the window bounds can only ADD candidates, never drop
    one the exact predicate would accept.  Output is byte-identical to
    the naive loop on both paths (property-tested in
    tests/test_properties.py).
    """
    rows: dict[float, list[tuple[float, str]]] = {}
    order: dict[float, int] = {}          # key → insertion index (bisect path)
    sorted_keys: list[float] = []         # keys, sorted by value (bisect path)
    eps = tolerance * 1e-9 + 1e-12
    use_bisect = False
    for y, x, t in words:
        # O(1) exact-key fast path: if y IS an existing cluster key,
        # that key is provably the first insertion-order match — every
        # key inserted before it was outside tolerance of this exact y
        # when it was created (else y's key would never have been
        # created), and it matches itself at distance 0 before any
        # later key is reached.  PDF words on one text line share an
        # identical rounded y, so most words take this path.  (-0.0
        # hashes/compares equal to 0.0 with identical distances, and a
        # NaN y misses the dict just as it fails every abs predicate.)
        row = rows.get(y)
        if row is not None:
            row.append((x, t))
            continue
        key = None
        if not use_bisect:
            # the reference's exact loop; ``-tol <= d <= tol`` IS
            # ``abs(d) <= tol`` for every float (incl. ±0/NaN) with d
            # computed identically — same predicate, no builtin call
            # (abs() alone was 5% of kernel tottime in the r4 profile)
            for ky in rows:
                d = ky - y
                if -tolerance <= d <= tolerance:
                    key = ky
                    break
        else:
            lo = bisect.bisect_left(sorted_keys, y - tolerance - eps)
            hi = bisect.bisect_right(sorted_keys, y + tolerance + eps)
            best = -1
            for ky in sorted_keys[lo:hi]:
                d = ky - y
                if -tolerance <= d <= tolerance:  # the exact predicate
                    idx = order[ky]
                    if best == -1 or idx < best:  # FIRST in insertion order
                        best = idx
                        key = ky
        if key is None:
            key = y
            rows[key] = []
            if use_bisect:
                order[key] = len(order)
                bisect.insort(sorted_keys, key)
            elif len(rows) >= _BISECT_SWITCH:
                use_bisect = True
                order = {k: i for i, k in enumerate(rows)}
                sorted_keys = sorted(rows)
        rows[key].append((x, t))
    get_x = itemgetter(0)  # stable x-sort; ties keep insertion order,
    lines = []             # same as the reference's key=lambda
    for ky in sorted(rows.keys()):
        items = sorted(rows[ky], key=get_x)
        line = RE_WS.sub(" ", " ".join(t for _, t in items).strip())
        if line:
            lines.append(line)
    return lines


def group_words_by_lines_and_cols(words, y_tol: float = 3.0):
    """Median-split column partition + full-page lines (app.py:120-133).

    Median rule: element ``n//2`` of the x-sorted list (upper median,
    NOT interpolated); ties ``x <= mid_x`` go left.
    """
    if not words:
        return [], {"left": [], "right": []}
    xs = sorted(w[1] for w in words)
    mid_x = xs[len(xs) // 2] if xs else 9999
    left = [w for w in words if w[1] <= mid_x]
    right = [w for w in words if w[1] > mid_x]
    return lines_from_words(words, tolerance=y_tol), {"left": left, "right": right}


def find_match_meta(lines, cols_words) -> dict:
    """Date/time regex extraction + per-column team-name heuristic
    (app.py:138-179).

    - date: first numeric ``dd.mm.yyyy`` else Russian textual date, over
      the first 160 lines (per-line priority: numeric beats textual);
    - time: first valid ``HH:MM`` over the first 200 lines;
    - team per column: words in the top 25% of that column's y-extent →
      lines → keep lines with a ≥3-char ALL-CAPS Cyrillic run and total
      length ≥ 8 → pick the longest (stable sort ⇒ earliest wins ties).
    """
    meta = {"date": "", "time_msk": "", "teams": {"home": "", "away": ""}}

    for ln in lines[:160]:
        m = RE_DATE_NUM.search(ln)
        if m:
            meta["date"] = m.group(0)
            break
        m2 = RE_DATE_RU.search(ln)
        if m2:
            meta["date"] = m2.group(0).replace(" г.", "").strip()
            break

    for ln in lines[:200]:
        m = RE_TIME.search(ln)
        if m:
            meta["time_msk"] = m.group(0)
            break

    def top_caps_from(words_part):
        if not words_part:
            return ""
        ys = [w[0] for w in words_part]
        y_min, y_max = min(ys), max(ys)
        y_cut = y_min + 0.25 * (y_max - y_min)
        top = [w for w in words_part if w[0] <= y_cut]
        cand = [ln for ln in lines_from_words(top, tolerance=3.0)
                if RE_CAPS3.search(ln) and len(ln) >= 8]
        if not cand:
            return ""
        cand = sorted(cand, key=len, reverse=True)
        return RE_WS2.sub(" ", cand[0]).strip()

    meta["teams"]["home"] = top_caps_from(cols_words["left"])
    meta["teams"]["away"] = top_caps_from(cols_words["right"])
    return meta


def find_ref_lines(lines):
    """Referee extraction: anchor scan + stateful pair-accumulator
    (app.py:191-231).

    Header = first of the first 100 lines containing BOTH header
    phrases; the next line carries the names.  Tokens matching
    ``^[А-ЯЁ][а-яё-]+$`` accumulate into 2-token names; any non-matching
    token resets the buffer.  Fallback (when <4 names but ≥4 tokens):
    overlapping adjacent bigrams, first 4.  Returns
    ``(main[:2], linesmen[2:4], debug)``.
    """
    debug: dict = {}
    header_idx = -1
    for i, ln in enumerate(lines[:100]):
        if (REF_HEADER_MAIN in ln) and (REF_HEADER_LINE in ln):
            header_idx = i
            break
    if header_idx != -1 and header_idx + 1 < len(lines):
        ref_line = lines[header_idx + 1]
        debug["raw_ref_line"] = ref_line
        ref_line = RE_UPDATED.sub("", ref_line).strip()
        parts = [p for p in RE_REF_SPLIT.split(ref_line) if p]

        names: list[str] = []
        buf: list[str] = []
        for p in parts:
            if RE_NAME_TOKEN.match(p):
                buf.append(p)
                if len(buf) == 2:
                    names.append(" ".join(buf))
                    buf = []
            else:
                buf = []

        if len(names) < 4 and len(parts) >= 4:
            alt = [parts[j] + " " + parts[j + 1]
                   for j in range(len(parts) - 1)
                   if RE_NAME_TOKEN.match(parts[j]) and RE_NAME_TOKEN.match(parts[j + 1])]
            if len(alt) >= 4:
                names = alt[:4]

        return names[:2], names[2:4], debug

    return [], [], {"note": "ref header not found"}


def collect_goalies_from_column(words_part) -> list[dict]:
    """Goalie section scan per column (app.py:273-300).

    Find the first line starting with «Вратари» in the first 120 lines;
    read the following ≤39 lines, stopping at «Звено …»; per line take
    the first 2–3-capitalized-word name and a standalone Cyrillic С/Р
    flag (→ "C"/"R").
    """
    if not words_part:
        return []
    lines = lines_from_words(words_part, tolerance=3.0)
    idx = -1
    for i, ln in enumerate(lines[:120]):
        if ln.strip().startswith(GOALIE_HEADER):
            idx = i
            break
    if idx == -1:
        return []

    out = []
    for ln in lines[idx + 1: idx + 40]:
        if ln.startswith(LINE_UNIT_PREFIX) or RE_LINE_UNIT.search(ln):
            break
        m = RE_GOALIE_NAME.search(ln)
        if not m:
            continue
        flag = "C" if RE_FLAG_C.search(ln) else ("R" if RE_FLAG_R.search(ln) else "")
        out.append({"name": m.group(1).strip(), "flag": flag})
    return out


# --- mode entry points over a pre-extracted word list -----------------------
# The reference re-runs text_words once per sub-extractor (app.py:183,235,
# 304 — 3× per mode=all request); here the caller extracts words ONCE and
# fans out, which is semantics-preserving because text_words is pure.


def extract_match_from_words(words) -> dict:
    """mode=words (app.py:182-186)."""
    lines_all, cols = group_words_by_lines_and_cols(words)
    return {"ok": True, "engine": "words", "match": find_match_meta(lines_all, cols)}


def extract_refs_from_words(words) -> dict:
    """mode=refs, text-layer path (app.py:234-268).

    The OCR fallback (app.py:240-263) needs rasterization + tesseract;
    mirroring the reference's graceful degradation when tesseract is
    absent (app.py:76-77), the fallback is a no-op here and lives in
    ``operators.ocr_fallback`` as a second-pass stage when the optional
    deps exist.
    """
    main, linesmen, dbg = find_ref_lines(lines_from_words(words))
    return {"ok": True, "engine": "ocr-refs",
            "referees": {"main": main, "linesmen": linesmen}, "_debug": dbg}


def extract_goalies_from_words(words) -> dict:
    """mode=goalies (app.py:303-343), text-layer path (same OCR note)."""
    _, cols = group_words_by_lines_and_cols(words)
    return {"ok": True, "engine": "gk",
            "goalies": {"home": collect_goalies_from_column(cols["left"]),
                        "away": collect_goalies_from_column(cols["right"])}}


def extract_all_from_words(words, season: str, uid: str) -> dict:
    """mode=all (app.py:348-366) minus self-timing (stamped by caller)."""
    lines_all, cols = group_words_by_lines_and_cols(words)
    return extract_all_from_parts(lines_all, cols, season, uid)


def extract_all_from_parts(lines_all, cols, season: str, uid: str) -> dict:
    """mode=all over pre-computed page parts.

    The reference recomputes ``text_words`` + line clustering once per
    sub-extractor (3× per request, app.py:183,235,304 — see SURVEY.md
    §3.1); since both are pure, computing them once per document is
    semantics-preserving and is the pipeline's single-pass fan-out."""
    meta = find_match_meta(lines_all, cols)
    main, linesmen, _ = find_ref_lines(lines_all)
    return {
        "ok": True,
        "engine": "all",
        "match": {"season": season, "uid": uid, **meta},
        "referees": {"main": main, "linesmen": linesmen},
        "goalies": {"home": collect_goalies_from_column(cols["left"]),
                    "away": collect_goalies_from_column(cols["right"])},
    }


def extracted_text(words) -> str:
    """The byte-identity payload: all reconstructed lines joined with \\n."""
    return "\n".join(lines_from_words(words))
