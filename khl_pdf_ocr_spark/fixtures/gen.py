"""Seeded synthetic fixture generator (fully offline, seed=42 convention).

Produces the pipeline input table in exactly the mandated shape
(BASELINE.json input_hint): ``url string, warc_ts timestamp, html binary,
text string, lang string`` — PDFs and HTML pages sharing the single
binary column — plus the golden expected-output table computed by the
refkernel at generation time (FIXTURES.md §§1-4).

Document mix (deterministic per index):
- ~55% synthetic game-sheet PDFs (minipdf) exercising every reference
  heuristic: two columns split at the median x, ALL-CAPS team names in
  the top quartile of each column, dd.mm.yyyy / Russian textual dates,
  HH:MM time, referee header+names line, «Вратари»…«Звено» goalie
  sections with С/Р flags, plus edge variants (exact y-tolerance 3.0,
  median-tie x, «Обновлено…» suffix, buffer-reset token, missing header,
  Flate-compressed streams);
- ~30% HTML pages with a main-content block, nav/sidebar/footer
  boilerplate, scripts/styles, Cyrillic+Latin text;
- ~5% plain-text (WET-style) rows;
- ~5% corrupt rows (garbage bytes / truncated PDF / undecodable binary);
- размер-skew: long-tailed payload sizes with rare MB-scale outliers so
  size-bucket salting and the N→4N scaling gate are actually exercised.

Names are drawn deterministically from the reference's master CSVs
(read-only at /root/reference, FIXTURES.md §6) when present, else from
an embedded fallback list.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from khl_pdf_ocr_spark.refkernel import minipdf
from khl_pdf_ocr_spark.refkernel.kernel import extract_document, result_to_json

GEN_VERSION = 8  # bump to invalidate cached fixture dirs

REFERENCE_DIR = os.environ.get("KHL_REFERENCE_DIR", "/root/reference")

# fallback name pools (used only if the reference CSVs are unavailable)
_FALLBACK_SURNAMES = [
    "Иванов", "Петров", "Сидоров", "Кузнецов", "Смирнов", "Попов", "Волков",
    "Соколов", "Лебедев", "Козлов", "Новиков", "Морозов", "Павлов", "Орлов",
    "Макаров", "Никитин", "Захаров", "Зайцев", "Соловьёв", "Борисов",
]
_FALLBACK_FIRST = [
    "Алексей", "Сергей", "Дмитрий", "Андрей", "Павел", "Иван", "Никита",
    "Михаил", "Егор", "Артём", "Денис", "Кирилл", "Максим", "Олег", "Игорь",
]

_TEAMS = [  # each joined name is ≥8 chars (team-candidate filter, app.py:171)
    ("ХК", "АВАНГАРД"), ("ХК", "МЕТАЛЛУРГ"), ("ХК", "ЛОКОМОТИВ"),
    ("ХК", "ТРАКТОР"), ("СКА", "САНКТ-ПЕТЕРБУРГ"), ("ЦСКА", "МОСКВА"),
    ("АК", "БАРС", "КАЗАНЬ"), ("ХК", "САЛАВАТ", "ЮЛАЕВ"), ("ХК", "ТОРПЕДО"),
    ("ХК", "СЕВЕРСТАЛЬ"), ("ХК", "НЕФТЕХИМИК"), ("ХК", "АВТОМОБИЛИСТ"),
]

_RU_MONTHS = ["января", "февраля", "марта", "апреля", "мая", "июня", "июля",
              "августа", "сентября", "октября", "ноября", "декабря"]

_EN_WORDS = ("the quick brown fox jumps over a lazy dog while spark executors "
             "shuffle partitions of columnar arrow batches across the cluster "
             "reading parquet files with predicate pushdown and codegen").split()
_RU_WORDS = ("быстрый серый волк прыгает через ленивую собаку пока спарк "
             "исполнители читают колонки паркета с фильтрами и агрегатами "
             "матча сезона лига команда игра шайба ворота период бросок").split()


def load_master_names() -> tuple[list[str], list[str]]:
    """Player / referee names from the reference master CSVs (BOM-stripped)."""

    def _read(path: str) -> list[str]:
        try:
            with open(path, encoding="utf-8-sig", newline="") as f:
                return [row[0].strip() for row in csv.reader(f) if row and row[0].strip()]
        except OSError:
            return []

    players = _read(os.path.join(REFERENCE_DIR, "players_master.csv"))
    referees = _read(os.path.join(REFERENCE_DIR, "referees_master.csv"))
    if not players:
        players = [f"{s} {n}" for s in _FALLBACK_SURNAMES for n in _FALLBACK_FIRST]
    if not referees:
        referees = [f"{s} {n}" for s, n in zip(_FALLBACK_SURNAMES, _FALLBACK_FIRST)]
    return players, referees


def _two_token(name: str) -> str:
    """Keep only 'Фамилия Имя' (masters sometimes carry an initial)."""
    parts = name.split()
    return " ".join(parts[:2]) if len(parts) >= 2 else name


# ---------------------------------------------------------------------------
# PDF game sheets
# ---------------------------------------------------------------------------


# x slot grid: words sit on fixed x positions so the reference's median
# rule (upper median of all word x's, app.py:129-132) splits the page
# cleanly at the last left slot.  Left column = slots 0-5 (x 40..260),
# right column = slots 6-11 (x 304..524), page-wide lines span 0-11.
_SLOT_W = 44.0
_SLOT_X0 = 40.0
_LAST_LEFT_SLOT_X = _SLOT_X0 + 5 * _SLOT_W  # 260.0


def _slot_x(i: int) -> float:
    return _SLOT_X0 + i * _SLOT_W


def make_game_sheet_words(rng: random.Random, players, referees, variant: int):
    """Word layout (x, y_top, text, size) for one synthetic game sheet."""
    words: list[tuple[float, float, str, float]] = []

    def put_line(side: str, y: float, text: str, size: float = 10.0):
        start = 6 if side == "R" else 0
        for j, tok in enumerate(text.split()):
            words.append((_slot_x(start + j), y, tok, size))

    # header (no ≥3-caps runs so it never beats the team names)
    put_line("L", 40.0, "Официальный протокол матча сезона")
    day, month, year = rng.randint(1, 28), rng.randint(1, 12), rng.choice([2024, 2025])
    hh, mm = rng.randint(11, 22), rng.choice([0, 15, 30, 45])
    if variant == 6:   # Russian textual date (fallback date path)
        put_line("W", 58.0, f"Дата встречи {day} {_RU_MONTHS[month-1]} {year} г.")
    elif variant == 7:  # no time anywhere
        put_line("W", 58.0, f"Дата встречи {day:02d}.{month:02d}.{year}")
    else:
        put_line("W", 58.0, f"Дата встречи {day:02d}.{month:02d}.{year} Начало {hh:02d}:{mm:02d} мск")

    # team names — top quartile of each column's y-extent
    home = " ".join(rng.choice(_TEAMS))
    away = " ".join(rng.choice(_TEAMS))
    put_line("L", 92.0, home, size=13.0)
    put_line("R", 92.0, away, size=13.0)

    # referee block (page-wide; lines_from_words over the whole page must
    # yield the header line, then the names line directly below)
    if variant != 5:  # variant 5: no referee header at all
        put_line("L", 150.0, "Главный судья Главный судья")
        put_line("R", 150.0, "Линейный судья Линейный судья")
        refs = [_two_token(rng.choice(referees)) for _ in range(4)]
        toks = " ".join(refs).split()
        if variant == 3:
            toks += f"Обновлено {day:02d}.{month:02d}.{year} в {hh:02d}:{mm:02d}".split()
        if variant == 4:  # buffer-reset token in the middle of a name pair
            toks.insert(1, str(rng.randint(10, 99)))
        put_line("W", 166.0, " ".join(toks))

    # goalie sections per column
    for side in ("L", "R"):
        put_line(side, 210.0, "Вратари")
        gy = 226.0
        for _ in range(rng.randint(1, 3)):
            num = rng.randint(1, 99)
            nm = _two_token(rng.choice(players))
            flag = rng.choice(["С", "Р", "", ""])
            put_line(side, gy, f"{num} {nm} {flag}".strip())
            gy += 16.0
        put_line(side, gy, f"Звено {rng.randint(1, 4)}")
        gy += 16.0
        # skater roster below (ignored by the goalie scan, feeds y-extent)
        for _ in range(rng.randint(6, 14)):
            num = rng.randint(1, 99)
            nm = _two_token(rng.choice(players))
            put_line(side, gy, f"{num} {nm} нападающий")
            gy += 14.0

    if variant == 1:  # words exactly y-tolerance 3.0 apart (must merge)
        words.append((_slot_x(0), 720.0, "граница", 10.0))
        words.append((_slot_x(1), 723.0, "кластера", 10.0))
        words.append((_slot_x(0), 726.2, "отдельно", 10.0))  # 3.2 gap → new cluster
    if variant == 2:  # median-tie: extra word exactly at the split x
        words.append((_LAST_LEFT_SLOT_X, 740.0, "медиана", 10.0))

    _balance_median(words)
    return words


def _balance_median(words: list[tuple[float, float, str, float]]) -> None:
    """Append inert filler words until the upper-median x equals the last
    left slot, so `x <= mid_x` (app.py:130-132) is exactly the left column."""
    fy = 790.0
    fslot = 0
    for _ in range(400):
        xs = sorted(w[0] for w in words)
        mid = xs[len(xs) // 2]
        if mid == _LAST_LEFT_SLOT_X:
            return
        if mid > _LAST_LEFT_SLOT_X:      # median sits in the right column → add left mass
            words.append((_LAST_LEFT_SLOT_X, fy, "зап", 8.0))
        else:                             # median inside left column → add right mass
            words.append((_slot_x(6 + fslot % 6), fy, "зап", 8.0))
            fslot += 1
        if len(words) % 6 == 0:
            fy += 10.0
    raise AssertionError("median balancing did not converge")


def make_game_sheet_pdf(rng, players, referees, variant: int,
                        compress: bool, pad_bytes: int) -> bytes:
    w = minipdf.PdfWriter(compress=compress)
    for x, y, t, size in make_game_sheet_words(rng, players, referees, variant):
        w.add_word(x, y, t, size)
    if variant == 0 and rng.random() < 0.5:
        # multipage: page 2 carries decoy content (caps team-like line,
        # different referee names) that must NOT leak into the page-0
        # extraction (reference restriction, app.py:67,86)
        w.new_page()
        w.add_word(40.0, 60.0, "ВТОРАЯ", 13.0)
        w.add_word(140.0, 60.0, "СТРАНИЦА", 13.0)
        w.add_word(40.0, 90.0, "Главный", 10.0)
        w.add_word(100.0, 90.0, "судья", 10.0)
        w.add_word(40.0, 106.0, _two_token(rng.choice(referees)), 10.0)
    if pad_bytes:
        w.add_padding(pad_bytes)
    return w.tobytes()


# ---------------------------------------------------------------------------
# HTML pages
# ---------------------------------------------------------------------------


def _sentence(rng: random.Random, pool, n: int) -> str:
    return " ".join(rng.choice(pool) for _ in range(n)).capitalize() + "."


def make_html_page(rng: random.Random, idx: int, lang: str, bloat: int = 0) -> bytes:
    pool = _RU_WORDS if lang == "ru" else _EN_WORDS
    title = _sentence(rng, pool, 4)[:-1]
    nav = " ".join(f'<a href="/s/{i}">{rng.choice(pool)}</a>' for i in range(8))
    paras = "\n".join(
        f"<p>{' '.join(_sentence(rng, pool, rng.randint(12, 30)) for _ in range(rng.randint(1, 4)))}</p>"
        for _ in range(rng.randint(3, 10) + bloat))
    sidebar = "\n".join(f'<li><a href="/t/{i}">{rng.choice(pool)} {rng.choice(pool)}</a></li>'
                        for i in range(10))
    page = f"""<!DOCTYPE html>
<html lang="{lang}"><head><meta charset="utf-8"><title>{title}</title>
<style>body{{margin:0}} .x{{color:red}}</style>
<script>var page_id={idx}; function track(){{return {idx}*2;}}</script>
</head><body>
<header><nav>{nav}</nav></header>
<div id="content"><h1>{title}</h1>
{paras}
</div>
<aside><ul>{sidebar}</ul></aside>
<footer><p>© {2020 + idx % 6} fixtures.test — <a href="/about">about</a> <a href="/tos">terms</a></p></footer>
</body></html>"""
    return page.encode("utf-8")


# ---------------------------------------------------------------------------
# Corpus assembly
# ---------------------------------------------------------------------------

_EPOCH = datetime(2025, 1, 1)


def generate_rows(n_docs: int, seed: int = 42):
    """Yield document-table rows. Deterministic in (n_docs, seed)."""
    players, referees = load_master_names()
    for idx in range(n_docs):
        rng = random.Random((seed << 20) ^ idx)  # per-doc stream → order-free
        warc_ts = _EPOCH + timedelta(seconds=idx * 37 + rng.randint(0, 17))
        kind = idx % 20  # deterministic mix: 11 pdf, 6 html, 1 text, 2 corrupt
        if kind < 11:
            season = 1300 + (idx % 5)
            uid = 880000 + idx
            variant = idx % 8
            compress = (idx % 3 == 0)
            pad = 0
            if idx % 97 == 96:            # rare MB-scale outlier
                pad = rng.randint(512_000, 1_500_000)
            elif idx % 13 == 12:          # mid-tail
                pad = rng.randint(32_000, 128_000)
            payload = make_game_sheet_pdf(rng, players, referees, variant, compress, pad)
            yield {"url": f"https://fixtures.test/pdf/{season}/{uid}/game-{uid}-start-ru.pdf",
                   "warc_ts": warc_ts, "html": payload, "text": None, "lang": "ru"}
        elif kind < 17:
            lang = "ru" if idx % 3 else "en"
            bloat = 40 if idx % 53 == 52 else 0
            payload = make_html_page(rng, idx, lang, bloat)
            yield {"url": f"https://fixtures.test/html/{idx}",
                   "warc_ts": warc_ts, "html": payload,
                   "text": None if idx % 2 else "stale WET text — do not trust",
                   "lang": lang}
        elif kind < 18:
            body = "\n".join(_sentence(rng, _EN_WORDS, rng.randint(8, 20))
                             for _ in range(rng.randint(5, 15)))
            yield {"url": f"https://fixtures.test/txt/{idx}",
                   "warc_ts": warc_ts, "html": body.encode("utf-8"),
                   "text": None, "lang": "en"}
        else:
            style = idx % 3
            if style == 0:
                payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
                payload = b"\x89GARBAGE" + payload  # undecodable, unknown magic
            elif style == 1:
                payload = b"%PDF-1.4\n" + bytes(rng.getrandbits(8) for _ in range(256))
            else:
                payload = b""
            yield {"url": f"https://fixtures.test/bad/{idx}",
                   "warc_ts": warc_ts, "html": payload, "text": None, "lang": ""}


DOCS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

GOLDEN_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("mode", pa.string()),
    ("extracted_text", pa.string()),
    ("result_json", pa.string()),
    ("ok", pa.bool_()),
    ("engine", pa.string()),
    ("error", pa.string()),
    ("detail", pa.string()),
    ("n_bytes", pa.int64()),
    ("n_lines", pa.int32()),  # matches EXTRACT_SCHEMA IntegerType
])

# every query mode of the reference API (app.py:405-412) gets golden rows,
# so the driver's DuckDB oracles can gate each mode on byte identity
GOLDEN_MODES = ("all", "words", "refs", "gk")


def write_tables(out_dir: str, n_docs: int, seed: int = 42, force: bool = False,
                 goldens: bool = True):
    """Write documents.parquet (+ goldens.parquet); cached by meta.json."""
    os.makedirs(out_dir, exist_ok=True)
    meta_path = os.path.join(out_dir, "meta.json")
    # the parsing backend is part of the cache key: installing PyMuPDF
    # later must invalidate goldens generated with the minipdf backend
    from khl_pdf_ocr_spark.refkernel.kernel import HAS_FITZ

    meta = {"n_docs": n_docs, "seed": seed, "version": GEN_VERSION,
            "goldens": goldens, "fitz": HAS_FITZ}
    docs_path = os.path.join(out_dir, "documents.parquet")
    gold_path = os.path.join(out_dir, "goldens.parquet") if goldens else None
    if not force and os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                if (json.load(f) == meta and os.path.exists(docs_path)
                        and (gold_path is None or os.path.exists(gold_path))):
                    return docs_path, gold_path
        except (OSError, json.JSONDecodeError):
            pass

    rows = list(generate_rows(n_docs, seed))
    docs = pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)
    # small row groups → fine-grained scan splits (scan parallelism must
    # scale with cores for the N→4N efficiency gate)
    pq.write_table(docs, docs_path, compression="snappy", row_group_size=512)

    if goldens:
        out = []
        for r in rows:
            for mode in GOLDEN_MODES:
                res = extract_document(r["url"], r["html"], mode=mode)
                text = res["extracted_text"]
                out.append({
                    "url": r["url"],
                    "mode": mode,
                    "extracted_text": text,
                    "result_json": result_to_json(res),
                    "ok": res["ok"],
                    "engine": res["engine"],
                    "error": res["error"],
                    "detail": res["detail"],
                    "n_bytes": len(r["html"]) if r["html"] is not None else 0,
                    "n_lines": (text.count("\n") + 1) if text else 0,
                })
        pq.write_table(pa.Table.from_pylist(out, schema=GOLDEN_SCHEMA),
                       gold_path, compression="snappy")
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return docs_path, gold_path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    docs, gold = write_tables(args.out, args.n, args.seed, force=args.force)
    print(json.dumps({"documents": docs, "goldens": gold, "n": args.n, "seed": args.seed}))


if __name__ == "__main__":
    main()
