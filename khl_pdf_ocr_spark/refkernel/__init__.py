"""Exact-semantics per-document kernel (pure Python, no C extensions).

Shared verbatim between the fixture/golden generator and the Spark UDFs
so that the byte-identity gate (BASELINE.json: "byte-identical extracted
text per url") is meaningful: both sides call the same functions.
"""
