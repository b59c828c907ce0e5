#!/usr/bin/env python
"""Regenerate QUERIES.md from registry.py (run after adding queries)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pulseboard_spark.registry import ORACLE_SQL, QUERIES  # noqa: E402

SECTIONS = [
    ("TPC-H-adapted relational suite",
     lambda n: n.startswith("tpch_") or n in {"orders_without_lineitems", "lineitem_profile"}),
    ("Anomaly rules & windowed aggregates (reference §2.4/§2.5)",
     lambda n: n.startswith(("r1_", "r2_", "r3_", "r4_", "win_", "sliding_", "events_per", "unique_"))
     or n in {"alerts", "ewma", "rolling_counter_24h"}),
    ("CDP: identity, profiles, segments (reference §2.2-§2.7)",
     lambda n: n.startswith(("cdp_", "identity_", "segment", "top20", "trait_", "component_"))),
    ("Dedup & similarity",
     lambda n: n.startswith(("dedup_", "ann_", "ivf_", "knn_", "label_", "similarity_", "hard_"))
     or n == "fuzzy_customer_pairs"),
    ("Text & corpus construction",
     lambda n: n.startswith(("bigram", "bpe_", "corpus_", "doc_", "gopher", "inverted", "lang_",
                             "media_text", "pack_", "pii_", "stratified", "term_", "text_",
                             "token_", "top_terms", "decontamination"))),
    ("Behavioral / time-series / ML prep", lambda n: True),
]


def first_doc_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    return doc.split("\n", 1)[0].strip() if doc else ""


def main() -> None:
    n_oracle = sum(1 for n in QUERIES if n in ORACLE_SQL)
    lines = [
        "# QUERIES — declared query index (generated from registry.py)",
        "",
        f"{len(QUERIES)} queries; “oracle” = DuckDB hash-checked by the driver at sf0.01",
        "(and by the in-repo sweep at sf0.1), “rows” = rows-only check",
        "(documented approximations / iterative algorithms).",
    ]
    placed: set[str] = set()
    for title, pred in SECTIONS:
        names = sorted(n for n in QUERIES if n not in placed and pred(n))
        placed.update(names)
        if not names:
            continue
        lines += ["", f"## {title}", ""]
        for n in names:
            kind = "oracle" if n in ORACLE_SQL else "rows"
            doc = first_doc_line(QUERIES[n])
            suffix = f" — {doc}" if doc else ""
            lines.append(f"- `{n}` ({kind}){suffix}")
    Path(__file__).resolve().parents[1].joinpath("QUERIES.md").write_text(
        "\n".join(lines) + "\n"
    )
    print(f"QUERIES.md: {len(QUERIES)} queries, {n_oracle} oracle-checked")


if __name__ == "__main__":
    main()
