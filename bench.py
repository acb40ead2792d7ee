"""Benchmark harness — times every registry query plus the VCR
record→estimate→replay core at $SPARK_GRAFT_SF_DIR (default sf0.1) and
prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Run: ``python bench.py``. Timing = full execution (collect) per query,
after one warm-up of the session (JVM + codegen caches are shared state
a real deployment would also have warm). Each query is sampled
``SPARK_GRAFT_BENCH_REPEATS`` (default 3) times: the first, cold sample
is the driver-shape number (headline ``value`` / ``queries``), the
median lands in ``queries_median`` for noise-robust pinning
(BASELINE.md cites this protocol).

Scale-validation modes (VERDICT r04 item 2; defaults unchanged for the
driver's bare ``python bench.py``):

- ``--sf 1.0`` resolves the data dir: driver dirs
  (``/root/testdata/sf{X}``) when present, else the locally generated
  ``.localdata/sf{X}`` (``tools/gen_testdata.py``);
- ``--queries a,b,c`` or ``--top N`` (N slowest per BENCH_DETAIL.json)
  restricts the run — at sf1.0 the point is the expensive tail, not
  108 sub-second entries;
- ``--detail-out PATH`` redirects the detail JSON so scale runs never
  clobber the driver-read BENCH_DETAIL.json;
- ``--skip-vcr-core`` omits the record/estimate/replay loop.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime, timedelta

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def bench_vcr_core(spark, sf_dir: str) -> dict[str, float]:
    """Reference core paths: record (stream→archive), estimate
    (metadata-only), replay batch planning (500/1MB caps)."""
    from pyspark.sql import functions as F

    from kinesis_vcr_spark.config import VcrConfig
    from kinesis_vcr_spark.functions.estimate import estimate_replay_time
    from kinesis_vcr_spark.model import RECORD_SCHEMA
    from kinesis_vcr_spark.play import replay_batch_plan
    from kinesis_vcr_spark.sources.archive import read_archive
    from kinesis_vcr_spark.streaming.record import record_stream
    from kinesis_vcr_spark.tables import load_table

    out: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="vcr_bench_")
    try:
        events = load_table(spark, sf_dir, "events")
        src_dir = f"{tmp}/source"
        events.select(
            F.encode("props", "utf-8").alias("data"),
            F.col("event_id").cast("string").alias("sequence_number"),
            F.col("user_id").cast("string").alias("partition_key"),
            (F.col("user_id") % 8).cast("string").alias("shard_id"),
            F.col("ts").alias("arrival_ts"),
        ).write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(RECORD_SCHEMA).parquet(src_dir)
        cfg = VcrConfig(
            archive_root=f"{tmp}/bucket",
            source_stream="events",
            checkpoint_location=f"{tmp}/ckpt",
        )
        t0 = time.time()
        record_stream(stream, cfg, available_now=True).awaitTermination(600)
        out["vcr_record"] = round(time.time() - t0, 3)

        start = datetime(2024, 1, 1)
        end = datetime.utcnow() + timedelta(days=1)
        t0 = time.time()
        estimate_replay_time(spark, cfg.archive_path, start, end, open_shards=2)
        out["vcr_estimate"] = round(time.time() - t0, 3)

        t0 = time.time()
        arch = read_archive(spark, cfg.archive_path, start, end, mtime_filter=False)
        plan = replay_batch_plan(arch)
        plan.agg(F.count("*"), F.sum("record_count")).collect()
        out["vcr_replay_plan"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# Probe batches for the persisted-index bench entries are capped at the
# sf0.1 doc_id range: daily ingest is day-sized however big the index
# has grown, so scale rungs measure index growth, not batch growth.
PROBE_BATCH_CAP = 5_000


def bench_index_probe(spark, sf_dir: str, repeats: int) -> list[float]:
    """Probe-ONLY timing for the persisted near-dup index (VERDICT r06
    item 4): the registry query ``dedup_index_incremental`` re-runs the
    full index BUILD every sample (that is its correctness contract),
    which buries the number the operator exists to deliver — the
    O(batch) probe against an index that already exists. Here the build
    happens once, untimed, into a scratch dir; each timed sample is
    open-index + probe + collect, the literal daily-ingest operation.
    Registry-external (no oracle row — the probe's VALUES are already
    oracle-checked through dedup_index_incremental; this entry only
    isolates its cost)."""
    from pyspark.sql import functions as F

    from kinesis_vcr_spark.operators.dedup_index import (
        build_near_dup_index,
        load_near_dup_index,
        near_dup_against_index,
    )
    from kinesis_vcr_spark.queries.dedup import IDX_NEW_MOD, J_THRESHOLD
    from kinesis_vcr_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.where(F.col("doc_id") % IDX_NEW_MOD != 0)
    # batch capped at the sf0.1-sized slice (PROBE_BATCH_CAP): a daily
    # ingest batch is day-sized regardless of how big the accumulated
    # index is, so scale rungs here grow the INDEX while the probe
    # batch stays fixed — the r07 PLANT_PROBE_CAP lesson (a probe set
    # proportional to the corpus turns every O(batch) claim into
    # O(corpus) by fixture construction). sf0.1 numbers are unchanged
    # (every doc_id there is under the cap).
    new = docs.where(
        (F.col("doc_id") % IDX_NEW_MOD == 0)
        & (F.col("doc_id") < PROBE_BATCH_CAP)
    )
    tmp = tempfile.mkdtemp(prefix="kvs_probe_bench_")
    try:
        build_near_dup_index(  # untimed: pay once per corpus, not per day
            old, f"{tmp}/index", "doc_id", "text",
            shingle_size=3, num_hashes=64, bands=16,
        )
        samples: list[float] = []
        for _ in range(repeats):
            t0 = time.time()
            idx = load_near_dup_index(spark, f"{tmp}/index")
            near_dup_against_index(
                new, idx, "doc_id", "text", threshold=J_THRESHOLD
            ).collect()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        return samples
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_persisted_index_probes(
    spark, sf_dir: str, repeats: int, which: set[str]
) -> dict[str, list[float]]:
    """Probe-ONLY timings for the persisted search / phrase / span
    indexes (VERDICT r08 item 2) — same rationale as
    :func:`bench_index_probe`: the registry ``*_incremental`` queries
    re-run the full index BUILD every sample (their correctness
    contract), which buries the number each index exists to deliver —
    the standing-query / batch-probe operation against an index that
    already exists. Builds happen once, untimed, into a scratch dir;
    each timed sample is open-index + probe + collect.
    Registry-external (no oracle rows — the probes' VALUES are already
    oracle-checked through the ``*_incremental`` rows; these entries
    only isolate their cost for drift gating)."""
    from pyspark.sql import functions as F

    from kinesis_vcr_spark.queries.dedup import IDX_NEW_MOD, SPAN_MIN_LEN
    from kinesis_vcr_spark.queries.tfidf import BM25_TERMS, PHRASE
    from kinesis_vcr_spark.tables import load_table, widen_small_scan

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.where(F.col("doc_id") % IDX_NEW_MOD != 0)
    new = docs.where(F.col("doc_id") % IDX_NEW_MOD == 0)
    out: dict[str, list[float]] = {}
    tmp = tempfile.mkdtemp(prefix="kvs_idx_probe_bench_")
    try:
        probes: dict[str, callable] = {}
        if "search_index_probe" in which:
            from kinesis_vcr_spark.operators.searchindex import (
                append_search_index,
                build_search_index,
                search_index_topk,
            )

            build_search_index(old, f"{tmp}/search")
            append_search_index(new, f"{tmp}/search", ingest_label="batch")
            probes["search_index_probe"] = lambda: search_index_topk(
                spark, f"{tmp}/search", list(BM25_TERMS), k=20
            )
        if "phrase_index_probe" in which:
            from kinesis_vcr_spark.operators.searchindex import (
                append_position_index,
                build_search_index,
                phrase_probe_index,
            )

            build_search_index(old, f"{tmp}/phrase")
            append_position_index(old, f"{tmp}/phrase", ingest_label="_base")
            append_position_index(new, f"{tmp}/phrase", ingest_label="batch")
            probes["phrase_index_probe"] = lambda: phrase_probe_index(
                spark, f"{tmp}/phrase", list(PHRASE)
            )
        if "span_index_probe" in which:
            from kinesis_vcr_spark.operators.spandedup import (
                append_gram_index,
                span_probe_index,
            )

            wdocs = widen_small_scan(
                load_table(spark, sf_dir, "documents")
            ).select("doc_id", "text")
            wold = wdocs.where(F.col("doc_id") % IDX_NEW_MOD != 0)
            # day-sized probe batch (see bench_index_probe): the index
            # grows with sf, the probed batch does not
            wnew = wdocs.where(
                (F.col("doc_id") % IDX_NEW_MOD == 0)
                & (F.col("doc_id") < PROBE_BATCH_CAP)
            )
            append_gram_index(
                wold, f"{tmp}/span", min_len=SPAN_MIN_LEN,
                ingest_label="_base",
            )
            append_gram_index(
                wnew, f"{tmp}/span", min_len=SPAN_MIN_LEN,
                ingest_label="batch",
            )
            probes["span_index_probe"] = lambda: span_probe_index(
                wnew, f"{tmp}/span", min_len=SPAN_MIN_LEN
            )
        if "phash_index_probe" in which:
            from kinesis_vcr_spark.operators.phash import (
                append_phash_index,
                fake_pixels,
                phash_probe_index,
            )

            def as_media(frame):
                return frame.select(
                    F.col("doc_id").alias("media_id"),
                    F.encode("text", "utf-8").alias("payload"),
                )

            pold = as_media(old)
            # day-sized probe batch, like the span/dedup probes
            pnew = as_media(new.where(F.col("doc_id") < PROBE_BATCH_CAP))
            append_phash_index(
                pold, f"{tmp}/phash", pixel_fn=fake_pixels,
                ingest_label="_base",
            )
            probes["phash_index_probe"] = lambda: phash_probe_index(
                pnew, f"{tmp}/phash", pixel_fn=fake_pixels
            )
        for name, make_probe in probes.items():
            print(f"[bench] {name}", file=sys.stderr)
            samples: list[float] = []
            for _ in range(repeats):
                t0 = time.time()
                make_probe().collect()
                samples.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
            out[name] = samples
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def calibration_probe(spark) -> float:
    """Fixed-work rig-speed probe (VERDICT r11 "What's wrong" 3):
    same-code bench runs spread up to 4.4× between sessions while both
    claimed ``contended: false``, so the contention flag alone cannot
    normalize cross-session comparisons. This preamble measures the
    RIG, not the engine: a pinned synthetic job — one JVM
    hash→shuffle→agg over 20 M longs plus one Arrow-batched numpy
    matmul chain per core — whose work is bit-identical every run.
    Recorded as ``calibration_s`` in BENCH_DETAIL.json and the stdout
    line; to compare two same-code runs, divide each total by its
    calibration first (BASELINE protocol note, r12). Runs AFTER
    warm-up so it measures steady-state rig speed, not JVM/worker
    startup."""
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql.functions import (  # noqa: PLC0415
        PandasUDFType,
        pandas_udf,
    )

    def _mm(v):
        import numpy as np  # noqa: PLC0415

        rng = np.random.default_rng(0)
        a = rng.standard_normal((256, 256))
        acc = a
        for _ in range(12):
            acc = acc @ a
            acc /= np.abs(acc).max()
        return pd.Series([float(acc[0, 0])] * len(v), dtype="float64")

    mm = pandas_udf(_mm, "double", PandasUDFType.SCALAR)
    cores = spark.sparkContext.defaultParallelism
    # median of 3: the r12 first pair of same-code runs measured a
    # single-shot probe at 2.18 vs 4.47 s while the WORKLOAD moved the
    # other way — one shot is scheduler/GC noise, not rig speed
    samples = []
    for _ in range(3):
        t0 = time.time()
        (
            spark.range(20_000_000, numPartitions=cores)
            .select(F.xxhash64("id").alias("h"))
            .repartition(cores, "h")
            .groupBy((F.col("h") % 1024).alias("b"))
            .count()
            .agg(F.sum("count"))
            .collect()
        )
        spark.range(cores, numPartitions=cores).select(mm("id")).collect()
        samples.append(round(time.time() - t0, 3))
    return sorted(samples)[1]


def detect_spark_contention() -> int:
    """Count FOREIGN JVMs already running a Spark driver/executor.

    BASELINE.md documents ~1.6× timing inflation when another Spark
    session shares the rig; pins recorded under contention absorb that
    noise. Called BEFORE this process creates its own session, so any
    org.apache.spark JVM found belongs to someone else. The count is
    annotated into both the stdout line and BENCH_DETAIL.json so a
    reader can discount (or re-run) a contended measurement.
    """
    def ppid_of(pid: int) -> int:
        with open(f"/proc/{pid}/stat") as f:
            # field 4; comm (field 2) may contain spaces — parse after
            # the closing paren
            return int(f.read().rsplit(")", 1)[1].split()[1])

    # our own ancestry (spark-submit launches bench.py UNDER the driver
    # JVM — that parent must not count as foreign contention)
    own: set[int] = set()
    pid = os.getpid()
    try:
        while pid > 1 and pid not in own:
            own.add(pid)
            pid = ppid_of(pid)
    except OSError:
        pass

    n = 0
    try:
        for entry in os.listdir("/proc"):
            if not entry.isdigit() or int(entry) in own:
                continue
            try:
                with open(f"/proc/{entry}/cmdline", "rb") as f:
                    cmd = f.read()
            except OSError:
                continue
            if b"java" in cmd and b"org.apache.spark" in cmd:
                n += 1
    except OSError:
        return 0
    return n


def _resolve_sf_dir(sf: float) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    # "sf0.1" and "sf1.0" both exist in the wild: try the %g spelling
    # (driver dirs) and the one-decimal spelling (generator default)
    for name in dict.fromkeys((f"sf{sf:g}", f"sf{sf:.1f}")):
        for base in ("/root/testdata", os.path.join(here, ".localdata")):
            cand = os.path.join(base, name)
            if os.path.isdir(cand):
                return cand
    raise SystemExit(
        f"no data for sf={sf:g}: generate it first with\n"
        f"  python tools/gen_testdata.py --sf {sf:g} --out .localdata/sf{sf:.1f}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=None)
    ap.add_argument("--queries", default=None, help="comma-separated names")
    ap.add_argument(
        "--top", type=int, default=None,
        help="run only the N slowest queries per BENCH_DETAIL.json",
    )
    ap.add_argument("--detail-out", default=None)
    ap.add_argument("--skip-vcr-core", action="store_true")
    args = ap.parse_args()

    if args.sf is not None:
        sf_dir = _resolve_sf_dir(args.sf)
    else:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    contention = detect_spark_contention()
    if contention:
        print(
            f"WARNING: {contention} foreign Spark JVM(s) alive — timings "
            "will be inflated (BASELINE.md: ~1.6x); results are annotated "
            '"contended": true.',
            file=sys.stderr,
        )

    from kinesis_vcr_spark.queries import all_queries
    from kinesis_vcr_spark.session import get_spark

    spark = get_spark("bench")
    timings: dict[str, float] = {}

    # Warm up the session on the smallest SF before timing anything:
    # q1 covers the JVM/codegen/parquet-footer path; text_fingerprint
    # covers the Python-worker path (daemon fork + numpy import across
    # all cores — ~10 s once per session, which would otherwise be
    # billed to whichever Pandas-UDF query runs first in sorted order).
    warm_queries = all_queries()
    warm_queries["q1_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001").collect()
    warm_queries["text_fingerprint"].spark_fn(spark, "/root/testdata/sf0.001").collect()
    # The sf0.001 fixture is ONE partition, so the line above forks one
    # or two Python workers, not the pool — BASELINE r10 addendum 6
    # measured the remaining 9-20 s worker-fork cost landing on
    # whichever Arrow query ran first at sf0.1. Fork the whole pool
    # explicitly: one Arrow batch per core, numpy imported in each.
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.functions import PandasUDFType, pandas_udf  # noqa: PLC0415

    def _warm_fn(v):
        import numpy as np  # noqa: PLC0415

        return pd.Series(np.asarray(v, dtype="float64"))

    # explicit functionType: `from __future__ import annotations`
    # stringifies hints, which the decorator form cannot resolve
    _warm_worker = pandas_udf(_warm_fn, "double", PandasUDFType.SCALAR)

    cores = spark.sparkContext.defaultParallelism
    spark.range(cores * 4, numPartitions=cores).select(
        _warm_worker("id")
    ).collect()

    # r15 (VERDICT r14 "What's wrong" 1): the 4-row batch above forks
    # the pool but leaves the first REAL-sized Arrow exchange cold —
    # driver cold samples of the first sf0.1 Arrow query swung
    # 1.0 ↔ 13.6 s between same-rig runs while the median sat at 0.68.
    # Push one realistic batch per core through the boundary: ~2000
    # rows of ~1 KB strings, decoded + reduced with numpy in the
    # worker, so the large-var-width Arrow buffers (both directions),
    # pandas string handling and per-worker numpy scratch allocations
    # are all grown to the sizes the timed queries use. Additions-only:
    # the timed protocol and the contract JSON are unchanged.
    from pyspark.sql import functions as _F  # noqa: PLC0415

    def _warm_big_fn(v):
        import numpy as np  # noqa: PLC0415

        out = np.empty(len(v), dtype="int64")
        for i, t in enumerate(v):
            c = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            out[i] = int(c.sum())
        return pd.Series(out)

    _warm_big = pandas_udf(_warm_big_fn, "long", PandasUDFType.SCALAR)
    (
        spark.range(cores * 2000, numPartitions=cores)
        .select(
            _F.concat(
                _F.lit("w" * 1024), _F.col("id").cast("string")
            ).alias("t")
        )
        .select(_warm_big("t"))
        .collect()
    )

    calibration_s = calibration_probe(spark)
    print(f"[bench] calibration_s={calibration_s}", file=sys.stderr)

    probe_entries = (
        "dedup_index_probe", "search_index_probe",
        "phrase_index_probe", "span_index_probe", "phash_index_probe",
    )
    selected = dict(all_queries())
    # registry-external probe-only entries: all on a full run, the
    # named ones under --queries, none under --top (the ranking file
    # already carries them once measured, so --top re-selects them)
    want_probes = (
        set(probe_entries) if not args.queries and not args.top else set()
    )
    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
        for p in probe_entries:
            if p in names:
                want_probes.add(p)
                names.remove(p)
        missing = [n for n in names if n not in selected]
        if missing:
            raise SystemExit(f"unknown queries: {missing}")
        selected = {n: selected[n] for n in names}
    elif args.top:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        with open(detail_path) as f:
            prior = json.load(f)["queries"]
        ranked = sorted(
            (n for n in prior if n in selected or n in probe_entries),
            key=lambda n: -prior[n],
        )
        top = ranked[: args.top]
        want_probes = {n for n in top if n in probe_entries}
        selected = {n: selected[n] for n in top if n in selected}

    # NOISE CONTROL (VERDICT r05 item 5): same-day host drift made
    # sub-second entries swing ±2× between rounds. Each query is timed
    # ``repeats`` times — the FIRST sample is the cold, driver-shape
    # number (headline total and round-over-round comparisons keep
    # using it), the per-query MEDIAN is recorded alongside for
    # noise-robust pinning. clearCache() between runs drops any
    # operator-internal persist (setjoin/triangles cache their exploded
    # token tables) so cached datasets never accumulate executor
    # storage across the 100+-query session (ADVICE r05) and every
    # sample rebuilds its own lineage.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    medians: dict[str, float] = {}
    for name, spec in sorted(selected.items()):
        print(f"[bench] {name}", file=sys.stderr)  # attribute failures
        samples: list[float] = []
        for _ in range(repeats):
            t0 = time.time()
            spec.spark_fn(spark, sf_dir).collect()
            samples.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        timings[name] = samples[0]  # cold
        medians[name] = sorted(samples)[(len(samples) - 1) // 2]

    if "dedup_index_probe" in want_probes:
        print("[bench] dedup_index_probe", file=sys.stderr)
        probe_samples = bench_index_probe(spark, sf_dir, repeats)
        timings["dedup_index_probe"] = probe_samples[0]
        medians["dedup_index_probe"] = sorted(probe_samples)[
            (len(probe_samples) - 1) // 2
        ]
    idx_probes = want_probes - {"dedup_index_probe"}
    if idx_probes:
        for name, samples in bench_persisted_index_probes(
            spark, sf_dir, repeats, idx_probes
        ).items():
            timings[name] = samples[0]
            medians[name] = sorted(samples)[(len(samples) - 1) // 2]

    if not args.skip_vcr_core:
        core_t = bench_vcr_core(spark, sf_dir)
        timings.update(core_t)
        medians.update(core_t)  # single-sample: median == cold

    total = round(sum(timings.values()), 3)
    # The driver captures only the LAST ~2000 bytes of stdout; r03's
    # full per-query dict outgrew that and the bench gate ran blind
    # ("parsed": null). So: full detail goes to BENCH_DETAIL.json next
    # to this script, and the final line stays compact — headline
    # metric + the vcr core + the slowest queries, hard-capped <1KB.
    detail = {
        "metric": "total_seconds_all_queries",
        "value": total,
        "value_median": round(sum(medians.values()), 3),
        "unit": "sec",
        "queries": timings,  # cold-first (driver-shape, round-comparable)
        "queries_median": medians,  # median of `repeats` runs (pinning)
        "repeats": repeats,
        "sf": sf,
        "contended": bool(contention),
        "foreign_spark_jvms": contention,
        "calibration_s": calibration_s,
    }
    detail_path = args.detail_out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    core = ("vcr_record", "vcr_estimate", "vcr_replay_plan")
    compact: dict[str, float] = {k: timings[k] for k in core if k in timings}
    slowest = sorted(
        (n for n in timings if n not in core),
        key=lambda n: -timings[n],
    )
    line = ""
    for n in slowest:
        candidate = dict(compact, **{n: timings[n]})
        line = json.dumps(
            {
                "metric": "total_seconds_all_queries",
                "value": total,
                "unit": "sec",
                "queries": candidate,
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
                "sf": sf,
                "contended": bool(contention),
                "calibration_s": calibration_s,
            }
        )
        if len(line) > 1000:
            break
        compact = candidate
    print(
        json.dumps(
            {
                "metric": "total_seconds_all_queries",
                "value": total,
                "unit": "sec",
                "queries": compact,
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
                "sf": sf,
                "contended": bool(contention),
                "calibration_s": calibration_s,
            }
        )
    )


if __name__ == "__main__":
    main()
