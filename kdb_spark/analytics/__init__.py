"""Analytics layer — SURVEY.md §2.B.

The reference has no analytics (payloads are opaque bytes, aggregation lives
in downstream consumers, `kdb.go:27-29`); its dense slot grid exists to feed
exactly these rollups (SURVEY.md §2.B "Aggregations"). Everything here is
declarative DataFrame ops — Catalyst owns pushdown, pruning, join selection,
and whole-stage codegen; there are no Python UDFs in any of these paths.
"""
