"""Does the parametric OPQ rotation (operators/opq.py) improve raw PQ
ADC quality? Measured, not assumed.

Protocol: same PQ settings as the registry rows (m=32, ksub=32, one
Lloyd refinement), raw ADC (NO exact re-rank — the re-rank stage
restores exact top-5 regardless of codebook quality, which would mask
the thing this tool measures). Two spaces:

- ``fixture``: the near-random driver embeddings — PQ's adversarial
  case AND the rotation's null case (a near-isotropic second moment
  has nothing to decorrelate; expect ≈ no change);
- ``manifold``: the planted clustered space of the *_manifold rows —
  low-rank structure the rotation can exploit.

Metrics per (space, variant):

- ``strict``: recall@5 vs exact cosine top-5 (same ids);
- ``cluster`` (manifold only): fraction of returns in the probe's
  planted cluster;
- ``distortion``: mean |adc_sim − exact cosine| over the returned
  pairs — the quantizer's scoring error, the quantity the balanced
  rotation directly optimizes (recall can saturate while distortion
  still improves, and distortion is what decides shortlist sizes).

Usage:  python tools/opq_recall.py [sf_dir]   (default sf0.1)
Prints one JSON line; BASELINE r13 cites it.
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = 32
KSUB = 32
TOP_K = 5


def _pairs(rows, score_col=None):
    by_q = defaultdict(dict)
    for r in rows:
        by_q[r["query_id"]][r["vec_id"]] = (
            float(r[score_col]) if score_col else None
        )
    return by_q


def _strict(exact, approx):
    per = [
        len(set(exact[q]) & set(approx.get(q, {}))) / len(exact[q])
        for q in exact
    ]
    return round(sum(per) / len(per), 4)


def _cluster(approx, man_k):
    per = []
    for q, vids in approx.items():
        if vids:
            per.append(
                sum(1 for v in vids if v % man_k == q % man_k) / len(vids)
            )
    return round(sum(per) / len(per), 4)


def _distortion(adc, exact_scores):
    errs = []
    for q, vids in adc.items():
        for v, s in vids.items():
            truth = exact_scores.get(q, {}).get(v)
            if truth is not None:
                errs.append(abs(s - truth))
    return round(sum(errs) / len(errs), 6) if errs else None


def _run_variant(corpus, probes, vec_col):
    from kinesis_vcr_spark.operators.pq import (
        pq_adc_topk,
        pq_encode_table,
        train_pq,
    )

    cb = train_pq(
        corpus, m=M, ksub=KSUB, vec_col=vec_col, refine_iterations=1
    )
    codes = pq_encode_table(corpus, cb, vec_col=vec_col)
    return _pairs(
        pq_adc_topk(
            codes, probes, cb, k=TOP_K, query_vec_col=vec_col
        ).collect(),
        score_col="adc_sim",
    )


def _exact_all(corpus, probes, vec_col, k=None):
    """Exact cosine scores for EVERY (probe, corpus) pair (bounded:
    nq × n on the fixture scales this tool runs at) — top-k for recall,
    full map for distortion lookup."""
    from kinesis_vcr_spark.operators.similarity import cosine_topk

    n = corpus.count()
    return _pairs(
        cosine_topk(
            corpus, probes, k=(k or n), vec_col=vec_col
        ).collect(),
        score_col="cosine",
    )


def _space(spark, corpus, probes, man_k=None):
    """Measure plain vs rotated on one space. The rotation is fitted on
    the corpus only (queries never leak into the fit)."""
    from pyspark.sql import functions as F

    from kinesis_vcr_spark.operators.opq import opq_rotation, rotate_vectors

    corpus = corpus.persist()
    probes = probes.persist()
    exact_scores = _exact_all(corpus, probes, "embedding")
    exact5 = {
        q: dict(
            sorted(vs.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
        )
        for q, vs in exact_scores.items()
    }

    out = {}
    plain = _run_variant(corpus, probes, "embedding")
    out["plain"] = {
        "strict": _strict(exact5, plain),
        "distortion": _distortion(plain, exact_scores),
    }

    rot = opq_rotation(corpus, "embedding", dim=64, m=M)
    rcorpus = rotate_vectors(corpus, rot, "embedding", "rotated").persist()
    rprobes = rotate_vectors(probes, rot, "embedding", "rotated")
    rotated = _run_variant(rcorpus, rprobes, "rotated")
    # rotation preserves inner products exactly, so distortion is still
    # measured against the UNrotated exact scores
    out["opq"] = {
        "strict": _strict(exact5, rotated),
        "distortion": _distortion(rotated, exact_scores),
    }
    rcorpus.unpersist()

    # full alternation (opq_refine, 3 iterations) at the same settings
    from kinesis_vcr_spark.operators.opq import opq_refine

    rot_it, _, hist = opq_refine(
        corpus, "embedding", dim=64, m=M, ksub=KSUB, iterations=3
    )
    icorpus = rotate_vectors(corpus, rot_it, "embedding", "rotated").persist()
    iprobes = rotate_vectors(probes, rot_it, "embedding", "rotated")
    refined = _run_variant(icorpus, iprobes, "rotated")
    out["opq_it"] = {
        "strict": _strict(exact5, refined),
        "distortion": _distortion(refined, exact_scores),
        "mse_history": [round(h, 6) for h in hist],
    }
    if man_k:
        out["plain"]["cluster"] = _cluster(plain, man_k)
        out["opq"]["cluster"] = _cluster(rotated, man_k)
        out["opq_it"]["cluster"] = _cluster(refined, man_k)
    icorpus.unpersist()
    corpus.unpersist()
    probes.unpersist()
    return out


def main() -> None:
    from kinesis_vcr_spark.queries.similarity import (
        MAN_K,
        N_QUERIES,
        _manifold,
        _probe_set,
    )
    from kinesis_vcr_spark.session import get_spark
    from kinesis_vcr_spark.tables import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("opq_recall")
    emb = load_table(spark, sf_dir, "embeddings")

    result = {"sf_dir": sf_dir, "m": M, "ksub": KSUB, "spaces": {}}
    result["spaces"]["fixture"] = _space(spark, emb, _probe_set(emb))
    mcorpus, mprobes, _ = _manifold(emb)
    result["spaces"]["manifold"] = _space(
        spark, mcorpus, mprobes, man_k=MAN_K
    )
    result["n_fixture"] = emb.count()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
