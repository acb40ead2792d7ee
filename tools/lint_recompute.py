"""Multiplicative-recompute lint (r13, VERDICT r12 item 3).

The trap this hunts: a registry query builds an expensive projection
once and consumes its LINEAGE many times (join sides, label joins,
eager counts) without persisting — every consumer re-executes the
whole upstream. Measured instances: `similarity_pq_manifold_rerank`
2.5× (r12 addendum 8), `llm_prep_spans` 3× (r12), `dedup_keep_best`
1.75× (r13). The signal is cheap to read off the OPTIMIZED plan: the
same parquet relation appearing many times with no InMemoryRelation
in the tree.

Sweep: build every registry query's DataFrame at sf0.001 (analysis
only — no collect; queries with eager sub-jobs run those, same as the
oracle gate) and report, per query, the max per-table scan count and
whether the plan caches anything. Queries over the threshold WITHOUT
a cache are the review list — not every hit is a bug (tiny dimension
scans are free to repeat; a broadcast bench side scanned twice is
fine), which is why this is a TOOL feeding review, plus pinned tests
for the known-heavy rows (tests/test_plans.py), not a hard gate.

**Measured interpretation rule (r13, BASELINE addendum 2)**: a high
scan count alone does NOT mean "add a persist". Persisting pays when
the repeated lineage crosses an EXPENSIVE boundary — Python/Arrow UDF
stages (the manifold plant: 2.5×), shuffles/windows feeding ≥3
consumers (dedup_keep_best: 1.75×), eager count passes over a full
pipeline (llm_prep_spans: 3×). When every branch is whole-stage
codegen over a pruned scan, the InMemoryRelation round-trip COSTS
more than the re-scans: persisting decontam_fuzzy (6 scans) measured
3.4 → 8.3 s med and split_leakage_audit (18 scans) 3.5 → 7.5 s med at
sf0.1 — both reverted. Review flagged queries by what sits ABOVE the
repeated scans, not by the count.

Usage:  python tools/lint_recompute.py [sf_dir] [threshold]
Prints one line per flagged query + a JSON summary line.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: optimized-plan Relation lines carry column names, not paths — key
#: each fixture table by its leading column
TABLE_BY_FIRST_COL = {
    "r_regionkey": "region", "n_nationkey": "nation",
    "c_custkey": "customer", "s_suppkey": "supplier",
    "p_partkey": "part", "o_orderkey": "orders",
    "l_orderkey": "lineitem", "event_id": "events",
    "doc_id": "documents", "vec_id": "embeddings",
}


def plan_scan_profile(df) -> tuple[dict[str, int], bool]:
    """(per-table parquet scan counts, has_cache) from the optimized
    logical plan string."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    counts: dict[str, int] = {}
    for first_col in re.findall(r"Relation \[(\w+)#", plan):
        t = TABLE_BY_FIRST_COL.get(first_col, f"?{first_col}")
        counts[t] = counts.get(t, 0) + 1
    return counts, "InMemoryRelation" in plan


def main() -> None:
    from kinesis_vcr_spark.queries import all_queries
    from kinesis_vcr_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("lint_recompute")
    flagged, errors = [], []
    for name, spec in sorted(all_queries().items()):
        try:
            df = spec.spark_fn(spark, sf_dir)
            counts, cached = plan_scan_profile(df)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            errors.append({"query": name, "error": str(e)[:120]})
            continue
        worst = max(counts.values(), default=0)
        if worst >= threshold and not cached:
            flagged.append({"query": name, "scans": counts})
            print(f"FLAG  {name}: {counts} (no cache in plan)")
    print(json.dumps({
        "sf_dir": sf_dir, "threshold": threshold,
        "flagged": flagged, "errors": errors,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
