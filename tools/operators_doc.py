#!/usr/bin/env python
"""Generate OPERATORS.md — the consolidated SURVEY §2 → registry key →
implementation → tests mapping (VERDICT r14 item 8).

Sources: REGISTRY.md (key → impl file:line → oracle), the registry itself
(family = key prefix), and a grep of tests/ for each key's name or its
implementing function name. Regenerate after registry changes:

    python tools/operators_doc.py
"""

from __future__ import annotations

import re
import subprocess
import sys

sys.path.insert(0, ".")

# key-prefix → (SURVEY §2 anchor, short family description)
FAMILIES = [
    ("kernel_", "§2.A O1–O25", "reference kernel verbs (Put/Get/Find/RemoveBefore, dense reads, LWW, retention)"),
    ("scan_", "§2.B scans/sources", "format adapters + layout-aware scans"),
    ("sink_", "§2.B sinks", "partitioned/bucketed/zorder/versioned writers"),
    ("ingest_", "§2.B ingest", "batch/stream append with snapshot seq"),
    ("retention_", "§2.B retention", "partition drop with hot-bucket guard"),
    ("series_", "§2.B filters", "tag-equality + range predicates"),
    ("payload_", "§2.B projections", "payload struct decode"),
    ("join_", "§2.B joins", "broadcast/sort-merge/as-of/interval/band/PIT/salted"),
    ("win_", "§2.B windows", "ordered analytics over per-series frames"),
    ("agg_", "§2.B aggregations", "group/rollup/sketch/statistical tests"),
    ("sql_", "§2.B SQL surface", "TPC-H-style multi-table analytics as SQL text"),
    ("scalar_", "§2.B scalar functions", "datetime/string/math/array/map/json/hash/bitwise"),
    ("set_", "§2.B set ops", "union/intersect/except"),
    ("sort_", "§2.B sorts", "global/partial/topk ordering"),
    ("stream_", "§2.B streaming", "Structured Streaming: windows, state, dedup, joins"),
    ("graph_", "§2.K graph", "components/pagerank/triangles/k-core/BFS (+fixpoint variants)"),
    ("table_", "§2.K table ops", "freshness/profile metadata"),
    ("pipeline_", "§2.K pipelines", "composed corpus-prep DAG"),
    ("rollup_", "§2.K rollup serve", "pre-agg maintenance + serving cut"),
    ("dedup_", "§2.K/LLM dedup", "exact/minhash/simhash/jaccard/substring/cluster"),
    ("decontaminate", "§2.K/LLM decontamination", "cross-corpus exact + fuzzy"),
    ("sim_", "§2.K/LLM similarity", "exact cosine top-k baseline"),
    ("ann_", "§2.K/LLM ANN", "sign-LSH bucketed search"),
    ("ivf", "§2.K/LLM ANN", "IVF / IVF-layout search"),
    ("pq_", "§2.K/LLM ANN", "product-quantization ADC"),
    ("emb_", "§2.K/LLM embeddings", "kmeans/pca/quantize/monitors/recall"),
    ("mm_", "§2.K/LLM multimodal", "binary decode (BMP/PNG/WAV), phash, census"),
    ("text_", "§2.K/LLM text", "quality/repetition/tfidf/bm25/ngram stats"),
    ("lang_", "§2.K/LLM text", "language id"),
    ("token_", "§2.K/LLM text", "token counting/histograms"),
    ("quality_", "§2.K/LLM text", "quality scoring"),
    ("ngram_", "§2.K/LLM text", "ngram top-k"),
    ("doc_", "§2.K/LLM text", "document fingerprinting"),
    ("chunk_", "§2.K/LLM curation", "chunking"),
    ("pack_", "§2.K/LLM curation", "sequence packing"),
    ("mix_", "§2.K/LLM curation", "mixture weights/apply/temperature"),
    ("dataset_", "§2.K/LLM curation", "split/kfold"),
    ("stratified_", "§2.K/LLM curation", "stratified sampling"),
    ("curation_", "§2.K/LLM curation", "token budget/data card/funnel/label quality"),
    ("pii_", "§2.K/LLM curation", "PII redaction"),
    ("udtf_", "§2.B UDTF", "table-function demo surface"),
    ("table", "§2.K table ops", "metadata"),
]


def family_of(key: str) -> tuple[str, str]:
    for pre, anchor, desc in FAMILIES:
        if key.startswith(pre):
            return anchor, desc
    return "§2.B", "misc"


def main() -> int:
    # key -> (impl, oracle) from REGISTRY.md
    imp: dict[str, tuple[str, str]] = {}
    for line in open("REGISTRY.md"):
        m = re.match(r"\|\s*\d+\s*\|\s*`([^`]+)`\s*\|\s*`([^`]+)`\s*\|\s*(\S+)\s*\|", line)
        if m:
            imp[m.group(1)] = (m.group(2), m.group(3))

    # tests referencing each key (by key name; fallback: impl function name)
    test_hits: dict[str, list[str]] = {}
    for key, (loc, _) in imp.items():
        f, ln = loc.rsplit(":", 1)
        func = None
        try:
            src = open(f).read().splitlines()
            i = int(ln) - 1
            while i >= 0:
                m = re.match(r"def (\w+)", src[i].strip())
                if m:
                    func = m.group(1)
                    break
                i -= 1
        except Exception:
            pass
        pats = [key] + ([func] if func and not func.startswith("_") else [])
        r = subprocess.run(
            ["grep", "-rlE", "|".join(re.escape(p) for p in pats), "tests/"],
            capture_output=True, text=True,
        )
        test_hits[key] = sorted(
            {p.split("/")[-1] for p in r.stdout.split() if p.endswith(".py")}
        )

    fams: dict[tuple[str, str], list[str]] = {}
    for key in imp:
        fams.setdefault(family_of(key), []).append(key)

    out = [
        "# OPERATORS — SURVEY §2 → registry key → implementation → tests",
        "",
        f"{len(imp)} registered keys. Generated by `tools/operators_doc.py`;",
        "regenerate after registry changes. `oracle` = sql(N) (DuckDB",
        "oracle, N lines). Test files are those that reference the key or",
        "its implementing function by name; every key is ALSO covered by",
        "the registry-wide gates (tests/test_registry.py schema/rotation",
        "checks, tools/check_oracle.py bit-exact DuckDB compare,",
        "tests/test_plans.py plan assertions where pinned).",
        "",
    ]
    for (anchor, desc), keys in sorted(fams.items()):
        out.append(f"## {anchor} — {desc} ({len(keys)} keys)")
        out.append("")
        out.append("| key | implementation | oracle | named in tests |")
        out.append("|---|---|---|---|")
        for k in sorted(keys):
            loc, orc = imp[k]
            tests = ", ".join(test_hits[k]) if test_hits[k] else "registry gates only"
            out.append(f"| `{k}` | `{loc}` | {orc} | {tests} |")
        out.append("")
    open("OPERATORS.md", "w").write("\n".join(out) + "\n")
    print(f"OPERATORS.md: {len(imp)} keys, {len(fams)} families")
    return 0


if __name__ == "__main__":
    sys.exit(main())
