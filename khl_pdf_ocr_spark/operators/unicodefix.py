"""Unicode normalization + mojibake repair — the ftfy-style text-fixing
stage every web-crawl corpus runs before scoring or deduplication
(CCNet normalizes before its LM; C4/Gopher assume sane codepoints; a
mojibake'd near-duplicate hashes differently from its clean twin, so
fixing AFTER dedup silently re-introduces duplicates).

The reference service has no corpus layer (`/root/reference/app.py` is
a single-document extractor); the grounding is the published recipe:
ftfy's core repair (R. Speer, "ftfy: fixes text for you", zenodo
2019) — text that encodes back to cp1252/latin-1 bytes and then
STRICTLY decodes as UTF-8 was, with overwhelming probability, UTF-8
read under the wrong codec; strict-decode success is the safety gate —
plus canonical-equivalence normalization to NFC (UAX #15, the
W3C-recommended storage form).

Two layers, cheapest first:

* ``strip_control_chars`` — C0/C1 control codepoints (except
  tab/LF/CR) dropped by one JVM ``regexp_replace``: pure whole-stage
  codegen, zero Python.
* ``fix_unicode`` — mojibake repair + NFC in ONE Arrow-batched
  ``mapInPandas`` pass.  There is no JVM expression for either (Spark
  has no Unicode-normalize builtin and no codec round-trip), so this
  is the documented (b)-tier custom operator: a deterministic pure
  function of the row, map-only, zero shuffle, batch-amortized.

Determinism/scale contract: every function here is a pure projection —
output depends only on the input string — so the stage is stable
across partitioning, cluster sizes, retries, and incremental re-runs
(the same contract as ``prepare.hash_split``).

The per-string kernel ``fix_mojibake_text`` is shared verbatim with
the tests' independent-model checks (the ``refkernel`` pattern: one
definition, two call sites, byte-identity between them is the gate).
No non-ASCII literal appears in this source — every char class is
built from byte values through the cp1252 table itself.
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fix_mojibake_text", "strip_control_chars_expr",
           "strip_control_chars", "fix_unicode"]


def _byte_char(b: int) -> str:
    """The char byte ``b`` surfaces as under a cp1252 read: cp1252's
    mapping, with its 5 holes (0x81 8D 8F 90 9D) passing through as
    the raw C1 codepoints (how latin-1-leaning real-world decoders and
    Python's WHATWG-aligned cp1252 behave for unmapped bytes)."""
    try:
        return bytes([b]).decode("cp1252")
    except UnicodeDecodeError:
        return chr(b)


# cp1252 decodings of UTF-8 lead bytes 0xC2-0xF4 (identity: U+00C2-F4),
# of continuation bytes 0x80-0xBF (curly-quote block + U+00A0-00BF),
# and of every byte a repairable run may contain (tab/LF/CR + 0x20-FF;
# multi-byte UTF-8 sequences never contain control bytes, so breaking
# runs at controls cannot split a sequence)
_LEAD_CHARS = "".join(re.escape(_byte_char(b)) for b in range(0xC2, 0xF5))
_CONT_CHARS = "".join(re.escape(_byte_char(b)) for b in range(0x80, 0xC0))
_RUN_CHARS = "".join(re.escape(_byte_char(b))
                     for b in [0x09, 0x0A, 0x0D] + list(range(0x20, 0x100)))
# a lead-byte char immediately followed by a continuation-byte char is
# the cheap candidate gate; the strict UTF-8 decode below is the proof
_MOJIBAKE_RE = re.compile(f"[{_LEAD_CHARS}][{_CONT_CHARS}]")
# maximal run of chars that map back to single bytes
_ENCODABLE_RUN = re.compile(f"[{_RUN_CHARS}]+")
# byte each run char maps back to (inverse of _byte_char, plus ASCII)
_CHAR_TO_BYTE = {_byte_char(b): b
                 for b in [0x09, 0x0A, 0x0D] + list(range(0x20, 0x100))}

_MAX_PASSES = 3  # double-encoded mojibake resolves in 2; 3 is the cap


def _to_bytes(run: str) -> bytes:
    """Map a run of single-byte-representable chars back to the bytes
    they were decoded from (exact inverse of ``_byte_char``)."""
    return bytes(_CHAR_TO_BYTE[ch] for ch in run)


def fix_mojibake_text(s: str | None) -> str | None:
    """Repair UTF-8-read-as-cp1252 mojibake, iterated to fixpoint for
    double-encoded text, then NFC-normalize.  NULL passes through.

    Conservative by construction: a run is rewritten ONLY when (a) it
    contains the lead+continuation signature, (b) every char in the
    run maps back to one byte (the run regex guarantees it), and
    (c) those bytes decode as STRICT UTF-8 — random cp1252 prose
    essentially never satisfies (c), which is ftfy's published safety
    argument.  Mixed content is handled by repairing maximal encodable
    runs independently, so one genuine bullet or emoji elsewhere in
    the document does not veto the repair.
    """
    if s is None:
        return None
    for _ in range(_MAX_PASSES):
        if not _MOJIBAKE_RE.search(s):
            break

        def _decode(seg: str) -> str | None:
            try:
                fixed = _to_bytes(seg).decode("utf-8")
            except UnicodeDecodeError:
                return None
            # refuse repairs that surface C1 controls — garbage that
            # happens to be valid UTF-8 (vanishingly rare) is not text
            if any(0x80 <= ord(c) <= 0x9F for c in fixed):
                return None
            return fixed

        def _repair(m: re.Match) -> str:
            run = m.group(0)
            if not _MOJIBAKE_RE.search(run):
                return run
            fixed = _decode(run)
            if fixed is not None:
                return fixed
            # whole-run decode vetoed (e.g. a genuine cp1252-range char
            # like a bullet sharing the run with real mojibake): retry
            # per whitespace token — multi-byte UTF-8 sequences never
            # contain ASCII whitespace, so the split is sequence-safe
            parts = re.split(r"(\s+)", run)
            return "".join(
                (_decode(p) or p) if _MOJIBAKE_RE.search(p) else p
                for p in parts)

        fixed_s = _ENCODABLE_RUN.sub(_repair, s)
        if fixed_s == s:
            break
        s = fixed_s
    return unicodedata.normalize("NFC", s)


def strip_control_chars_expr(col: Column) -> Column:
    """C0/C1 controls except tab/LF/CR removed — one codegen'd
    ``regexp_replace`` (DEL and the C1 block included; NBSP kept)."""
    return F.regexp_replace(
        col, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\x80-\\x9f]", "")


def strip_control_chars(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """JVM-only control-char scrub of ``text_col`` in place."""
    return df.withColumn(text_col, strip_control_chars_expr(F.col(text_col)))


def fix_unicode(df: DataFrame, *, text_col: str = "text",
                out_col: str | None = None,
                strip_controls: bool = True) -> DataFrame:
    """Mojibake repair + NFC over ``text_col`` (in place unless
    ``out_col`` names a new column), all other columns preserved.

    One ``mapInPandas`` projection: map-only, no shuffle, Arrow
    batches; the JVM control-strip (cheap, codegen) runs AFTER the
    repair so that C1 chars which were really misdecoded UTF-8 bytes
    get repaired into text rather than deleted.
    """
    from pyspark.sql import types as T

    target = out_col or text_col
    fields = list(df.schema.fields)
    if target not in df.columns:
        fields = fields + [T.StructField(target, T.StringType())]
    schema = T.StructType(fields)

    def _fix(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[target] = [fix_mojibake_text(t) for t in pdf[text_col]]
            yield pdf

    out = df.mapInPandas(_fix, schema)
    if strip_controls:
        out = out.withColumn(target, strip_control_chars_expr(F.col(target)))
    return out
