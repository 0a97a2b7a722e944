"""Unit tests for the layout/extraction operators — the edge cases called
out in SURVEY.md §5.2.2 (reference semantics at the boundaries)."""

from khl_pdf_ocr_spark.refkernel import pdfops


def w(y, x, t):
    return (y, x, t)


# --- lines_from_words: greedy y-clustering ---------------------------------


def test_cluster_exact_tolerance_merges():
    # |ky - y| <= 3.0 merges (app.py:104 uses <=)
    lines = pdfops.lines_from_words([w(10.0, 0, "a"), w(13.0, 5, "b")])
    assert lines == ["a b"]


def test_cluster_beyond_tolerance_splits():
    lines = pdfops.lines_from_words([w(10.0, 0, "a"), w(13.1, 5, "b")])
    assert lines == ["a", "b"]


def test_cluster_greedy_first_match_is_order_dependent():
    # word at y=13 joins the FIRST cluster within tolerance (y=10), even
    # though a closer cluster (y=14) exists later in insertion order
    words = [w(10.0, 0, "a"), w(16.0, 0, "c"), w(13.0, 5, "b")]
    lines = pdfops.lines_from_words(words)
    assert lines == ["a b", "c"]


def test_cluster_key_is_first_word_y():
    # chain: 10 — 13 (joins 10) — 15.5 (|10-15.5|>3 → new cluster even
    # though it is within 3 of the 13-word, because the KEY stays 10)
    words = [w(10.0, 0, "a"), w(13.0, 5, "b"), w(15.5, 9, "c")]
    assert pdfops.lines_from_words(words) == ["a b", "c"]


def test_cluster_items_sorted_by_x_and_ws_collapsed():
    words = [w(10.0, 50, "b"), w(10.0, 10, "a"), w(10.0, 90, " c ")]
    assert pdfops.lines_from_words(words) == ["a b c"]


# --- median column split ----------------------------------------------------


def test_median_upper_element_and_tie_goes_left():
    # xs sorted = [1,2,3,4] → mid = xs[2] = 3 (upper median, app.py:130);
    # tie x == 3 goes LEFT (app.py:131)
    words = [w(0, 1, "a"), w(0, 2, "b"), w(0, 3, "c"), w(0, 4, "d")]
    _, cols = pdfops.group_words_by_lines_and_cols(words)
    assert [t for _, _, t in cols["left"]] == ["a", "b", "c"]
    assert [t for _, _, t in cols["right"]] == ["d"]


def test_median_empty_words():
    lines, cols = pdfops.group_words_by_lines_and_cols([])
    assert lines == [] and cols == {"left": [], "right": []}


# --- find_match_meta ---------------------------------------------------------


def _mk_cols(words):
    return pdfops.group_words_by_lines_and_cols(words)


def test_date_numeric_beats_textual_per_line():
    lines = ["начало 5 марта 2025 и 05.03.2025"]
    meta = pdfops.find_match_meta(lines, {"left": [], "right": []})
    assert meta["date"] == "05.03.2025"


def test_date_textual_fallback_strips_year_suffix():
    lines = ["дата 5 марта 2025 г. прочее"]
    meta = pdfops.find_match_meta(lines, {"left": [], "right": []})
    assert meta["date"] == "5 марта 2025"


def test_time_validates_hours_minutes():
    meta = pdfops.find_match_meta(["в 25:99 или 19:30"], {"left": [], "right": []})
    assert meta["time_msk"] == "19:30"


def test_team_from_top_quartile_longest_caps_line():
    left = [w(0.0, 10, "ХК"), w(0.0, 40, "АВАНГАРД"),
            w(5.0, 10, "МЕТАЛЛУРГ"), w(5.0, 40, "МАГНИТОГОРСК"),
            w(100.0, 10, "КАПС"), w(400.0, 10, "низ")]
    meta = pdfops.find_match_meta([], {"left": left, "right": []})
    # y-extent 0..400, cut=100 → candidates: "ХК АВАНГАРД" и
    # "МЕТАЛЛУРГ МАГНИТОГОРСК" и "КАПС" (len<8 filtered) → longest wins
    assert meta["teams"]["home"] == "МЕТАЛЛУРГ МАГНИТОГОРСК"
    assert meta["teams"]["away"] == ""


def test_team_requires_min_length_8():
    left = [w(0.0, 10, "ЦСКА"), w(400.0, 10, "низ")]
    meta = pdfops.find_match_meta([], {"left": left, "right": []})
    assert meta["teams"]["home"] == ""


# --- find_ref_lines -----------------------------------------------------------


HDR = "Главный судья Главный судья Линейный судья Линейный судья"


def test_refs_happy_path():
    main, linesmen, _ = pdfops.find_ref_lines(
        [HDR, "Иванов Алексей Петров Сергей Сидоров Павел Кузнецов Денис"])
    assert main == ["Иванов Алексей", "Петров Сергей"]
    assert linesmen == ["Сидоров Павел", "Кузнецов Денис"]


def test_refs_buffer_reset_on_non_name_token():
    # "12" between Иванов and Алексей resets the buffer → pairing shifts,
    # primary loop finds <4 names → bigram fallback (app.py:218-225)
    main, linesmen, _ = pdfops.find_ref_lines(
        [HDR, "Иванов 12 Алексей Петров Сергей Сидоров Павел Кузнецов"])
    # adjacent name-token bigrams: Алексей+Петров, Петров+Сергей, ...
    assert main == ["Алексей Петров", "Петров Сергей"]
    assert linesmen == ["Сергей Сидоров", "Сидоров Павел"]


def test_refs_obnovleno_suffix_stripped():
    main, linesmen, _ = pdfops.find_ref_lines(
        [HDR, "Иванов Алексей Петров Сергей Сидоров Павел Кузнецов Денис"
              " Обновлено 01.02.2025 в 10:00"])
    assert main == ["Иванов Алексей", "Петров Сергей"]
    assert linesmen == ["Сидоров Павел", "Кузнецов Денис"]


def test_refs_header_missing():
    main, linesmen, dbg = pdfops.find_ref_lines(["просто строка", "ещё строка"])
    assert main == [] and linesmen == []
    assert "note" in dbg


def test_refs_header_beyond_first_100_lines_ignored():
    lines = [f"строка {i}" for i in range(101)] + [HDR, "Иванов Алексей"]
    main, linesmen, _ = pdfops.find_ref_lines(lines)
    assert main == [] and linesmen == []


# --- goalies -------------------------------------------------------------------


def _col(lines_spec):
    """Build a word column: one word per line at increasing y."""
    words = []
    for i, ln in enumerate(lines_spec):
        for j, tok in enumerate(ln.split()):
            words.append((i * 10.0, j * 30.0, tok))
    return words


def test_goalies_section_scan_with_flags():
    col = _col(["Вратари", "30 Сорокин Илья С", "1 Федотов Иван Р",
                "40 Просто Вратарь", "Звено 1", "9 Игрок Полевой С"])
    out = pdfops.collect_goalies_from_column(col)
    assert out == [{"name": "Сорокин Илья", "flag": "C"},
                   {"name": "Федотов Иван", "flag": "R"},
                   {"name": "Просто Вратарь", "flag": ""}]


def test_goalies_stop_at_zveno_regex():
    col = _col(["Вратари", "30 Сорокин Илья", "тут Звено 2 внутри",
                "1 Федотов Иван"])
    out = pdfops.collect_goalies_from_column(col)
    assert [g["name"] for g in out] == ["Сорокин Илья"]


def test_goalies_no_header():
    assert pdfops.collect_goalies_from_column(_col(["30 Сорокин Илья"])) == []
    assert pdfops.collect_goalies_from_column([]) == []


def test_goalies_three_word_name():
    col = _col(["Вратари", "30 Исаев Даниил Александрович С"])
    out = pdfops.collect_goalies_from_column(col)
    assert out == [{"name": "Исаев Даниил Александрович", "flag": "C"}]


# --- sort/project ---------------------------------------------------------------


def test_sort_project_words_rounds_y_in_key_only():
    words8 = [(100.0, 10.04, 0, 0, "b", 0, 0, 0),
              (50.0, 10.01, 0, 0, "a", 0, 0, 0)]
    out = pdfops.sort_project_words(words8)
    # round(10.04,1)==round(10.01,1)==10.0 → tie broken by x; y unrounded
    assert [t for _, _, t in out] == ["a", "b"]
    assert out[0][0] == 10.01
