"""Deterministic synthetic corpus: Common-Crawl-shaped document table
(url, warc_ts, html binary, text, lang) + golden extraction fixtures."""
