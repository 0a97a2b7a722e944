"""Text analytics + multimodal plumbing."""

import pytest

from khl_pdf_ocr_spark.operators.multimodal import (frame_sample_plan,
                                                    image_features)
from khl_pdf_ocr_spark.operators.textstats import (language_id, quality_filter,
                                                   text_stats)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat and the dog slept in the sun for a while "
            "as the day went on and on with more of the same words to count", "x"),
        (1, "Привет мир это русский текст про хоккей и матчи сезона лиги", "x"),
        (2, "1234 5678 9999 0000 1111 2222", "x"),
        (3, "", "x"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_text_stats(docs):
    out = {r["doc_id"]: r for r in text_stats(docs).collect()}
    assert out[0]["n_tokens"] == 31
    assert out[0]["n_stopwords"] >= 8
    assert out[3]["n_tokens"] == 0
    assert out[2]["n_digits"] == 24
    assert 0.0 <= out[2]["quality"] < out[0]["quality"] <= 1.0


def test_language_id(docs):
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    assert out[0] == "en"
    assert out[1] == "ru"
    assert out[2] == "other"


def test_quality_filter_drops_junk(docs):
    kept = {r["doc_id"] for r in quality_filter(docs, min_score=0.5).collect()}
    assert 0 in kept
    assert 2 not in kept and 3 not in kept


def test_image_features_batch_shape(spark):
    rows = [(f"m{i}", "image", bytes([i]) * (100 + i),
             {"width": None, "height": None, "duration_ms": None, "mime": "image/x-fake"})
            for i in range(10)]
    from khl_pdf_ocr_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = image_features(df).collect()
    assert len(out) == 10
    by_id = {r["media_id"]: r for r in out}
    assert by_id["m0"]["n_bytes"] == 100
    assert len(by_id["m0"]["phash"]) == 16
    # deterministic fake: same payload → same phash
    again = {r["media_id"]: r["phash"] for r in image_features(df).collect()}
    assert again == {r["media_id"]: r["phash"] for r in out}


def test_real_decode_is_explicitly_stubbed():
    from khl_pdf_ocr_spark.operators.multimodal import _decode_image_stub

    with pytest.raises(NotImplementedError):
        _decode_image_stub(b"x", real_decode=True)


def test_frame_sample_plan():
    assert frame_sample_plan(3500, 1000) == [0, 1000, 2000, 3000]
    assert frame_sample_plan(0, 1000) == []
    assert frame_sample_plan(-5, 1000) == []


def _make_ppm(width, height):
    """Gradient P6 image, pure bytes."""
    header = f"P6\n# test fixture\n{width} {height}\n255\n".encode()
    px = bytearray()
    for y in range(height):
        for x in range(width):
            px += bytes([(x * 255) // max(width - 1, 1),
                         (y * 255) // max(height - 1, 1), 128])
    return header + bytes(px)


def test_decode_ppm_real_pixels():
    from khl_pdf_ocr_spark.operators.multimodal import decode_ppm

    w, h, pixels = decode_ppm(_make_ppm(16, 9))
    assert (w, h) == (16, 9)
    assert len(pixels) == 16 * 9 * 3
    # corner pixels of the gradient
    assert pixels[0:3] == bytes([0, 0, 128])
    assert pixels[-3:] == bytes([255, 255, 128])
    with pytest.raises(ValueError):
        decode_ppm(b"not a ppm")
    with pytest.raises(ValueError):
        decode_ppm(_make_ppm(4, 4)[:-5])  # truncated


def test_image_features_real_decode_path(spark):
    """The swap-one-function contract, proven with real pixels: the
    real_decode path parses PPM and produces a true average-hash."""
    from khl_pdf_ocr_spark.operators.multimodal import MEDIA_SCHEMA, image_features

    rows = [(f"p{i}", "image", _make_ppm(32 + i, 24),
             {"width": None, "height": None, "duration_ms": None,
              "mime": "image/x-portable-pixmap"}) for i in range(4)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in image_features(df, real_decode=True).collect()}
    assert out["p0"]["width"] == 32 and out["p0"]["height"] == 24
    assert out["p3"]["width"] == 35
    assert len(out["p0"]["phash"]) == 16
    # a left-right gradient's ahash differs from a solid image's
    solid = b"P6\n2 2\n255\n" + bytes([10, 10, 10]) * 4
    from khl_pdf_ocr_spark.operators.multimodal import _decode_image_stub
    s = _decode_image_stub(solid, real_decode=True)
    assert s["width"] == 2 and s["phash"] != out["p0"]["phash"]


def test_real_decode_non_ppm_still_explicitly_stubbed():
    from khl_pdf_ocr_spark.operators.multimodal import _decode_image_stub

    with pytest.raises(NotImplementedError):
        _decode_image_stub(b"\x89PNG\r\n", real_decode=True)


def test_resize_ppm_box_average():
    from khl_pdf_ocr_spark.operators.multimodal import decode_ppm, resize_ppm

    # 2x2 checkerboard (black/white) -> 1x1 box average = mid gray 127
    board = b"P6\n2 2\n255\n" + bytes([0, 0, 0, 255, 255, 255,
                                       255, 255, 255, 0, 0, 0])
    w, h, px = decode_ppm(resize_ppm(board, 1, 1))
    assert (w, h) == (1, 1) and px == bytes([127, 127, 127])
    # downscale of the gradient keeps monotone left-to-right reds
    w, h, px = decode_ppm(resize_ppm(_make_ppm(16, 8), 4, 2))
    reds = [px[i * 3] for i in range(4)]
    assert (w, h) == (4, 2) and reds == sorted(reds) and reds[0] < reds[-1]
    # upscale (nearest-ish box) round-trips dimensions
    w, h, _ = decode_ppm(resize_ppm(_make_ppm(3, 3), 6, 6))
    assert (w, h) == (6, 6)


def test_resize_images_stage(spark):
    from khl_pdf_ocr_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                        decode_ppm,
                                                        resize_images)

    rows = [("ok1", "image", _make_ppm(32, 24), None),
            ("ok2", "image", _make_ppm(7, 5), None),
            ("bad", "image", b"\x89PNG not a ppm", None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(df, 8, 6).collect()}
    assert out["ok1"]["error"] is None
    w, h, _ = decode_ppm(bytes(out["ok1"]["payload"]))
    assert (w, h) == (8, 6) == (out["ok1"]["width"], out["ok1"]["height"])
    # error-envelope row, not a task failure
    assert out["bad"]["payload"] is None
    assert "ValueError" in out["bad"]["error"]


def _make_wav(freq_hz: int = 440, ms: int = 100, rate: int = 8000,
              amp: int = 10000, nch: int = 1) -> bytes:
    import io
    import math
    import struct
    import wave

    n = rate * ms // 1000
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack("<h", int(amp * math.sin(2 * math.pi * freq_hz * i / rate))
                        ) * nch for i in range(n))
        w.writeframes(frames)
    return buf.getvalue()


def test_audio_features_real_wav(spark):
    """The audio path is fully real (stdlib wave): duration, RMS, peak
    and zero-crossing rate of synthesized sine payloads."""
    import math

    from khl_pdf_ocr_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                        audio_features)

    rows = [("a440", "audio", _make_wav(440), None),
            ("a880", "audio", _make_wav(880), None),
            ("stereo", "audio", _make_wav(440, nch=2), None),
            ("bad", "audio", b"not audio at all", None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in audio_features(df).collect()}

    a = out["a440"]
    assert a["error"] is None
    assert a["sample_rate"] == 8000 and a["n_channels"] == 1
    assert a["duration_ms"] == 100
    # sine RMS = amp/sqrt(2) within quantization tolerance
    assert abs(a["rms"] - 10000 / math.sqrt(2)) < 150
    assert 9900 <= a["peak"] <= 10000
    # zero-crossing rate doubles with frequency (2f crossings/sec)
    assert abs(a["zero_cross_rate"] - 2 * 440 / 8000) < 0.02
    assert abs(out["a880"]["zero_cross_rate"] - 2 * 880 / 8000) < 0.02
    assert out["stereo"]["n_channels"] == 2
    assert out["stereo"]["duration_ms"] == 100
    assert out["bad"]["error"] is not None and out["bad"]["rms"] is None


def test_bpe_token_count_cross_engine(spark):
    """The BPE-ish pre-tokenizer count must agree between Java regex
    (Spark) and RE2 (DuckDB) on every boundary case — the regex is
    deliberately restricted to lookahead-free, explicit-class
    constructs where the two engines' leftmost-first semantics
    coincide."""
    import duckdb
    from pyspark.sql import functions as F

    from khl_pdf_ocr_spark.functions.text import (BPE_TOKEN_RE,
                                                  bpe_token_count)

    cases = ["hello world", "  doubled  spaces ", "a1b2",
             "привет мир 42!", "x--y,,z", "", "   ",
             "tab\there\nnewline\r", "ёжик Ёж", "mixed 123abc !!",
             "a", " ", "...", "42", "word 'quoted' (paren)"]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               ["i", "t"])
    got = {r["i"]: r["n"] for r in
           df.select("i", bpe_token_count(F.col("t")).alias("n")).collect()}
    con = duckdb.connect()
    for i, c in enumerate(cases):
        want = con.execute("SELECT len(regexp_extract_all(?, ?))",
                           [c, BPE_TOKEN_RE]).fetchone()[0]
        assert got[i] == want, (c, got[i], want)
    # sanity: sub-word counts exceed whitespace counts on symbol-mixed text
    assert got[4] == 5   # x--y,,z → x, --, y, ,,, z
    assert got[14] == 7  # word, ', quoted, ', (, paren, )


def test_winnow_kernel_parity(spark):
    """r6 change #16: the Arrow-batched winnow kernel must equal the
    retained higher-order-expression oracle value-for-value — incl.
    NULL, empty, whitespace-only, shorter-than-k, exactly-k, unicode
    (Cyrillic + astral plane: split('')/ascii() are per CODE POINT,
    replayed via utf-32 in the kernel), and boundary window counts."""
    import random

    from khl_pdf_ocr_spark.functions.text import (_winnow_fingerprint_expr,
                                                  with_winnow_fingerprint)

    rng = random.Random(17)
    words = ["alpha", "beta", "gamma", "речка", "ёлка", "x"]
    rows = [(i, " ".join(rng.choice(words)
                         for _ in range(rng.randint(0, 40))))
            for i in range(40)]
    rows += [(100, None), (101, ""), (102, "   "), (103, "ab"),
             (104, "abcdefg"), (105, "abcdefgh"),      # n = k, k+1
             (106, "emoji \U0001F600 inside and я text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kern = {r["doc_id"]: (None if r["winnow_fp"] is None
                          else list(r["winnow_fp"]))
            for r in with_winnow_fingerprint(df).collect()}
    expr = {r["doc_id"]: (None if r["winnow_fp"] is None
                          else list(r["winnow_fp"]))
            for r in _winnow_fingerprint_expr(df).collect()}
    assert kern == expr
    assert kern[100] == [None] and kern[101] == [0]


def test_winnow_fingerprint_edit_robustness(spark):
    """Winnowing property: a local edit changes only the fingerprints
    near the edit; a position shift (prefix insertion) preserves most of
    the selected hash set — unlike the md5 whole-document fingerprint."""
    from khl_pdf_ocr_spark.functions.text import with_winnow_fingerprint

    base = ("the quick brown fox jumps over the lazy dog while autumn "
            "leaves drift across the quiet river valley at dawn today")
    rows = [(0, base, "s"),
            (1, "PREFIX INSERTED " + base, "s"),          # shifted
            (2, base.replace("river", "creek"), "s"),      # local edit
            (3, "completely different text on another topic entirely with "
                "no shared phrasing at all anywhere in this string", "s")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    fp = {r["doc_id"]: set(r["winnow_fp"])
          for r in with_winnow_fingerprint(df).collect()}

    def jac(a, b):
        return len(fp[a] & fp[b]) / len(fp[a] | fp[b])

    assert jac(0, 1) > 0.7     # shift-robust
    assert jac(0, 2) > 0.6     # local edit → most fingerprints survive
    assert jac(0, 3) < 0.05    # unrelated text shares ~nothing
    # deterministic across runs
    again = {r["doc_id"]: set(r["winnow_fp"])
             for r in with_winnow_fingerprint(df).collect()}
    assert again == fp


# ---------------------------------------------------------------------------
# video on real bytes: PPMV container (r3 VERDICT #8)
# ---------------------------------------------------------------------------


def _ppm_frame(w, h, shade):
    """Solid-shade P6 frame — real header + real raster bytes."""
    return (f"P6\n{w} {h}\n255\n".encode()
            + bytes([shade % 256, (shade * 3) % 256, (shade * 7) % 256]) * (w * h))


def test_ppmv_roundtrip_and_demux():
    from khl_pdf_ocr_spark.operators.multimodal import (decode_ppm,
                                                        decode_ppmv,
                                                        encode_ppmv)

    frames = [_ppm_frame(6, 4, s) for s in (10, 120, 250)]
    payload = encode_ppmv(frames, fps=2)
    fps, out = decode_ppmv(payload)
    assert fps == 2 and len(out) == 3
    # each demuxed frame identical to decoding it standalone
    for raw, (w, h, pix) in zip(frames, out):
        assert (w, h, pix) == decode_ppm(raw)


def test_ppmv_rejects_garbage():
    import pytest as _pt

    from khl_pdf_ocr_spark.operators.multimodal import (decode_ppmv,
                                                        encode_ppmv)

    with _pt.raises(ValueError):
        decode_ppmv(b"\x00\x01binary junk")
    with _pt.raises(ValueError):
        decode_ppmv(b"PPMV 2\n")                      # zero frames
    with _pt.raises(ValueError):                      # truncated frame
        decode_ppmv(encode_ppmv([_ppm_frame(4, 4, 9)], 1)[:-5])


def test_video_features_real_bytes(spark):
    from khl_pdf_ocr_spark.operators.multimodal import (_ahash, MEDIA_SCHEMA,
                                                        decode_ppmv,
                                                        encode_ppmv,
                                                        video_features)

    # 5 frames @ 2 fps = 2500 ms → samples at 0, 1000, 2000 ms
    # → frame indices 0, 2, 4
    frames = [_ppm_frame(8, 8, 40 * i) for i in range(5)]
    good = encode_ppmv(frames, fps=2)
    rows = [("v_good", "video", good,
             {"width": None, "height": None, "duration_ms": None,
              "mime": "video/x-ppmv"}),
            ("v_bad", "video", b"not a video at all",
             {"width": None, "height": None, "duration_ms": None,
              "mime": "video/mp4"})]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in video_features(df).collect()}

    g = out["v_good"]
    assert g["error"] is None
    assert (g["fps"], g["n_frames"], g["duration_ms"]) == (2, 5, 2500)
    assert (g["width"], g["height"]) == (8, 8)
    want = [_ahash(decode_ppmv(good)[1][i][2], 8, 8) for i in (0, 2, 4)]
    assert g["sample_phashes"] == ",".join(want)

    b = out["v_bad"]
    assert b["error"] and b["error"].startswith("ValueError")
    assert b["fps"] is None and b["sample_phashes"] is None
    assert b["n_bytes"] == len(b"not a video at all")


# ---------------------------------------------------------------------------
# unigram LM quality scoring (round 4): CCNet-style perplexity stand-in
# ---------------------------------------------------------------------------


def test_unigram_lm_scores_match_duckdb(spark):
    import duckdb
    import pytest as _pt

    from khl_pdf_ocr_spark.operators.textstats import (
        train_unigram_lm, unigram_logprob_scores)

    DOCS = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(DOCS)
    lm = train_unigram_lm(docs, vocab_size=500)
    got = {r["doc_id"]: r for r in
           unigram_logprob_scores(docs, lm).collect()}

    oov = duckdb.sql(f"""
        WITH toks AS (
          SELECT unnest(list_filter(regexp_split_to_array(
                   trim(regexp_replace(regexp_replace(lower(text),
                        '[.,!?;:]', '', 'g'), '\\s+', ' ', 'g')), '\\s+'),
                 t -> length(t) > 0)) AS token
          FROM read_parquet('{DOCS}') WHERE text IS NOT NULL
        ), counts AS (
          SELECT token, count(*) AS n FROM toks GROUP BY token
        ), lm AS (
          SELECT token, ln(n) - ln((SELECT sum(n) FROM counts)) AS logprob
          FROM counts ORDER BY n DESC, token ASC LIMIT 500
        )
        SELECT min(logprob) - ln(10) FROM lm
    """).fetchone()[0]
    want = duckdb.sql(f"""
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                   trim(regexp_replace(regexp_replace(lower(text),
                        '[.,!?;:]', '', 'g'), '\\s+', ' ', 'g')), '\\s+'),
                 t -> length(t) > 0)) AS token
          FROM read_parquet('{DOCS}') WHERE text IS NOT NULL
        ), counts AS (
          SELECT token, count(*) AS n FROM toks GROUP BY token
        ), lm AS (
          SELECT token, ln(n) - ln((SELECT sum(n) FROM counts)) AS logprob
          FROM counts ORDER BY n DESC, token ASC LIMIT 500
        )
        SELECT t.doc_id, count(*) AS n_scored,
               avg(coalesce(lm.logprob, {oov})) AS avg_lp
        FROM toks t LEFT JOIN lm USING (token)
        GROUP BY t.doc_id
    """).df().set_index("doc_id")
    assert len(want) > 0
    for doc_id, row in want.iterrows():
        g = got[doc_id]
        assert g["n_scored_tokens"] == row["n_scored"]
        assert g["avg_logprob"] == _pt.approx(row["avg_lp"], rel=1e-9)


def test_unigram_scores_rank_junk_below_prose(spark):
    from pyspark.sql import functions as F

    from khl_pdf_ocr_spark.operators.textstats import (
        train_unigram_lm, unigram_logprob_scores)

    prose = ("the quick brown fox jumps over the lazy dog and the cat "
             "sits near the warm fire in the old house by the river")
    corpus = spark.createDataFrame(
        [(i, prose + f" day {i}") for i in range(20)]
        + [(100, "zxqv kjwpj qqoxz mmvnb hgftr lkjhg")   # gibberish
           , (101, None), (102, "   ")],
        ["doc_id", "text"])
    lm = train_unigram_lm(corpus, vocab_size=100)
    out = {r["doc_id"]: r for r in
           unigram_logprob_scores(corpus, lm).collect()}
    assert out[100]["avg_logprob"] < out[0]["avg_logprob"]   # junk scores lower
    assert out[101]["n_scored_tokens"] == 0                  # NULL text kept,
    assert out[101]["avg_logprob"] is None                   # never vanished
    assert out[102]["n_scored_tokens"] == 0
    assert len(out) == 23
    # lm is bounded and broadcastable
    assert lm.count() <= 100
    plan = unigram_logprob_scores(corpus, lm) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_unigram_scores_deterministic_fold_matches_default(spark):
    """deterministic_fold sums logprobs in canonical sorted order —
    same values as the default F.avg path to float tolerance, same
    n_scored_tokens exactly, same NULL semantics for empty docs, and
    bit-identical across repartitionings (the property the driver's
    exact-value oracle needs; the default avg is only
    order-of-arrival-stable)."""
    from khl_pdf_ocr_spark.operators.textstats import (
        train_unigram_lm, unigram_logprob_scores)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lm = train_unigram_lm(docs, vocab_size=500)
    default = {r["doc_id"]: r for r in
               unigram_logprob_scores(docs, lm).collect()}
    folded = {r["doc_id"]: r for r in
              unigram_logprob_scores(docs, lm,
                                     deterministic_fold=True).collect()}
    assert set(default) == set(folded)
    for i in default:
        assert default[i]["n_scored_tokens"] == folded[i]["n_scored_tokens"]
        a, b = default[i]["avg_logprob"], folded[i]["avg_logprob"]
        if a is None:
            assert b is None
        else:
            assert abs(a - b) < 1e-9
    refolded = {r["doc_id"]: r["avg_logprob"] for r in
                unigram_logprob_scores(docs.repartition(13), lm,
                                       deterministic_fold=True).collect()}
    # bit-identical, not approximately equal: the fold order is
    # canonical, so partitioning cannot perturb the sum
    assert refolded == {i: folded[i]["avg_logprob"] for i in folded}


# ---------------------------------------------------------------------------
# image near-dup pairs (perceptual ahash × simhash banding)
# ---------------------------------------------------------------------------


def test_image_near_dup_pairs_real_pixels(spark):
    """Resized copies of the same image pair up (hamming ≈ 0); distinct
    images do not — real PPM pixels through the real average-hash."""
    from khl_pdf_ocr_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                        image_features,
                                                        image_near_dup_pairs)

    def inverted(width, height):
        header = f"P6\n{width} {height}\n255\n".encode()
        px = bytearray()
        for y in range(height):
            for x in range(width):
                px += bytes([255 - (x * 255) // max(width - 1, 1),
                             255 - (y * 255) // max(height - 1, 1), 128])
        return header + bytes(px)

    rows = [
        ("orig", "image", _make_ppm(32, 24), None),
        ("resized", "image", _make_ppm(64, 48), None),   # same gradient
        ("thumb", "image", _make_ppm(16, 12), None),     # same gradient
        ("negative", "image", inverted(32, 24), None),   # far away
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = image_features(df, real_decode=True)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_near_dup_pairs(feats, max_hamming=5).collect()}
    assert {frozenset(p) for p in pairs} == \
        {frozenset(x) for x in [("orig", "resized"), ("orig", "thumb"),
                                ("resized", "thumb")]}
    assert all(h <= 5 for h in pairs.values())
    assert all("negative" not in p for p in pairs)


def test_image_near_dup_exact_recall_vs_brute_force(spark):
    """max_bucket=None pigeonhole recall check: banding finds exactly
    the brute-force hamming pairs over the fake-decode (sha-derived,
    effectively random) hashes."""
    from pyspark.sql import functions as F

    from khl_pdf_ocr_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                        image_features,
                                                        image_near_dup_pairs)

    rows = [(f"m{i:03d}", "image", bytes([i % 251]) * (50 + i), None)
            for i in range(120)]
    # plant guaranteed near-dups: identical payloads -> identical hashes
    rows += [("m900", "image", rows[5][2], None),
             ("m901", "image", rows[7][2], None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = image_features(df).select("media_id", "phash").cache()

    got = {(r["id_a"], r["id_b"]) for r in
           image_near_dup_pairs(feats, max_hamming=6).collect()}

    hi = F.conv(F.substring("phash", 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring("phash", 9, 8), 16, 10).cast("long")
    h = feats.select(F.col("media_id").alias("id"),
                     F.shiftleft(hi, 32).bitwiseOR(lo).alias("h"))
    brute = (h.alias("a").join(h.alias("b"),
                               F.col("a.id") < F.col("b.id"))
             .filter(F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h"))) <= 6)
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")))
    want = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    assert ("m005", "m900") in want and ("m007", "m901") in want
    assert got == want
    feats.unpersist()


def test_compression_ratio_signal(spark):
    """Repetitive boilerplate compresses below prose; glyph soup sits
    near 1; values match a direct zlib computation exactly."""
    import zlib

    from khl_pdf_ocr_spark.operators.textstats import compression_ratio

    words = ("referee confirmed final score video review coaches "
             "accepted decision protest press conference period "
             "goaltender penalty overtime shootout attendance "
             "arena captain assistant forward defenseman").split()
    import hashlib as _hl
    prose = " ".join(                             # varied, non-periodic
        words[_hl.sha256(str(i).encode()).digest()[0] % len(words)]
        for i in range(300))
    boiler = "Accept cookies to continue. " * 40  # pure repetition
    import hashlib
    h = b""
    seed = b"s"
    while len(h) < 1200:                          # incompressible junk
        seed = hashlib.sha256(seed).digest()
        h += seed
    soup = h[:1200].decode("latin-1")
    docs = spark.createDataFrame(
        [(1, prose), (2, boiler), (3, soup), (4, None), (5, "")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    assert out[2]["zlib_ratio"] < out[1]["zlib_ratio"] < out[3]["zlib_ratio"]
    assert out[2]["zlib_ratio"] < 0.15          # boilerplate tail
    assert out[3]["zlib_ratio"] > 0.65          # junk tail
    assert out[4]["zlib_ratio"] is None and out[5]["zlib_ratio"] is None
    b = prose.encode("utf-8")
    assert abs(out[1]["zlib_ratio"] - len(zlib.compress(b, 6)) / len(b)) < 1e-12
    assert out[1]["n_bytes"] == len(b)


def test_text_analytics_kernel_parity(spark):
    # r6: text_analytics runs as an Arrow-batched kernel; the staged
    # Catalyst expression form stays as the oracle.  Adversarial rows:
    # NULL, empty, space/tab-only, NBSP (Java \s is ASCII — must stay
    # one token), mixed-script \b adjacency, digits/punct/cyrillic
    # density extremes, quality rounding boundary values, long text.
    from khl_pdf_ocr_spark.functions.text import (_text_analytics_expr,
                                                  text_analytics)

    rows = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "\t"),
        (5, "a\xa0b nbsp stays joined"),
        (6, "привет мир это русский текст с буквами ёЁ и длиной"),
        (7, "the a of and to in is on for with the the the"),
        (8, "numbers 123 456 7890 1.5, 2.5; mixed! ok?"),
        (9, "словоthe гибрид theслово the konec"),
        (10, " ".join(f"w{i}" for i in range(250))),
        (11, "x" * 3000),
        (12, "полуfifty the of пятьдесят and mixed язык text."),
        (13, "0.78875 boundary 0.78875 boundary the of and"),
        (14, "\t leading tab and trailing \t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text_analytics(df).collect()}
    want = {r["doc_id"]: r for r in _text_analytics_expr(df).collect()}
    # preview variant: kernel-computed normalized prefix vs the JVM
    # normalized_text expression (the doc_text_analytics query shape)
    from khl_pdf_ocr_spark.functions.text import normalized_text
    from pyspark.sql import functions as F
    jvm_prev = {r["doc_id"]: r["preview"] for r in df.select(
        "doc_id", F.substring(normalized_text(F.col("text")), 1, 48)
        .alias("preview")).collect()}
    k_prev = {r["doc_id"]: r["preview"] for r in
              text_analytics(df, preview=48).collect()}
    assert k_prev == jvm_prev
    assert set(got) == set(want)
    for k in want:
        assert got[k].asDict() == want[k].asDict(), \
            f"doc {k}: {got[k]} != {want[k]}"
