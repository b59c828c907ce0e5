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


def driver_status() -> tuple[dict[str, str], str]:
    """Per-query driver evidence from CORRECTNESS_r*.json (latest round
    wins) plus the NEXT round's window label (latest recorded round + 1 —
    the window queues work for the round that has not run yet).
    Distinguishes a driver-recorded result from the in-repo strict-parity
    sweep — the two are NOT the same evidence class."""
    import json

    root = Path(__file__).resolve().parents[1]
    status: dict[str, str] = {}
    last = 0
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = path.stem.split("_")[-1]
        last = max(last, int(rnd.lstrip("r")))
        rows = json.loads(path.read_text())
        for name, rec in rows.items():
            if rec.get("err"):
                status[name] = f"driver-ERR {rnd}"
            elif rec.get("hash_match"):
                status[name] = f"driver-green {rnd}"
            elif rec.get("hash_match") is False:
                status[name] = f"driver-FAIL {rnd}"
            elif rec.get("rows_match"):
                status[name] = f"driver-rows {rnd}"
    return status, f"r{last + 1:02d}"


def main() -> None:
    n_oracle = sum(1 for n in QUERIES if n in ORACLE_SQL)
    drv, window_round = driver_status()
    front50 = set(list(QUERIES)[:50])
    lines = [
        "# QUERIES — declared query index (generated from registry.py)",
        "",
        f"{len(QUERIES)} queries; “oracle” = DuckDB-checked (driver hash gate at",
        "sf0.01 + in-repo strict-parity sweep), “rows” = rows-only check",
        "(documented approximations / iterative algorithms).",
        "",
        "Driver evidence (CORRECTNESS_rNN.json) is reported per query and is",
        "distinct from the in-repo sweep: `driver-green rNN` = external driver",
        "hash match in round NN; `repaired, in rNN window` = last driver row",
        "was FAIL/ERR (r02's surface-encoding classes: HUGEINT dtype image /",
        "array column), repaired and re-queued at the front of the driver's",
        "50-query window; `repo-green` = strict in-repo parity only, no",
        "driver row yet.",
    ]
    n_green = n_window = 0
    placed: set[str] = set()
    for title, pred in SECTIONS:
        names = sorted(n for n in QUERIES if n not in placed and pred(n))
        placed.update(names)
        if not names:
            continue
        lines += ["", f"## {title}", ""]
        for n in names:
            kind = "oracle" if n in ORACLE_SQL else "rows"
            d = drv.get(n, "")
            if d.startswith("driver-green") or d.startswith("driver-rows"):
                mark = d
                n_green += 1
            elif n not in ORACLE_SQL:
                # rows-only queries are excluded from the hash window by
                # policy (the driver records no_oracle as a fail row —
                # r03 burned 5 slots proving it); their evidence is the
                # pinned tests + exact-twin oracle queries.  One that
                # slipped INTO the window would repeat the r03 burn, so
                # flag it loudly instead of asserting the policy holds.
                if n in front50:
                    mark = "rows-only IN WINDOW — will record a fail, rotate it OUT"
                    n_window += 1
                else:
                    mark = "pinned-by-test; excluded from hash window by policy"
            elif d.startswith(("driver-FAIL", "driver-ERR")):
                # the front-50 check is real, not assumed: a failed query
                # accidentally left below the boundary must not claim a
                # driver re-check it will not get
                where = f"in {window_round} window" if n in front50 else "NOT in window — rotate it in"
                mark = f"repaired, {where}"
                n_window += 1
            elif n in front50:
                mark = f"repo-green, in {window_round} window"
                n_window += 1
            else:
                mark = "repo-green"
            doc = first_doc_line(QUERIES[n])
            suffix = f" — {doc}" if doc else ""
            lines.append(f"- `{n}` ({kind}; {mark}){suffix}")
    Path(__file__).resolve().parents[1].joinpath("QUERIES.md").write_text(
        "\n".join(lines) + "\n"
    )
    print(
        f"QUERIES.md: {len(QUERIES)} queries, {n_oracle} oracle-checked, "
        f"{n_green} driver-recorded green, {n_window} queued in the {window_round} window"
    )


if __name__ == "__main__":
    main()
