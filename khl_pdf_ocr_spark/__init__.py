"""khl_pdf_ocr_spark — a PySpark-native web-scale extraction engine.

A from-scratch reimplementation of the capabilities of the reference
single-document extractor (GG-Andrew/khl-pdf-ocr, surveyed in SURVEY.md)
as a cluster-scale batch pipeline:

- ``refkernel``  — exact-semantics, pure-Python per-document kernel
  (PDF word/layout parse, y-clustering, regex field extraction, HTML
  boilerplate stripping).  This is the single source of truth shared by
  the golden-fixture generator and the Spark UDFs, which is what makes
  the byte-identity correctness gate possible.
- ``operators``  — Spark DataFrame operators: Arrow-batched extraction,
  size-bucketed salted partitioning, dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), similarity search, text analytics,
  multimodal column plumbing.
- ``pipeline``   — the end-to-end batch job with checkpointed partition
  manifests (idempotent resume) and per-partition lineage metrics.
- ``streaming``  — Structured Streaming variant (Trigger.AvailableNow).
"""

__version__ = "0.1.0"
