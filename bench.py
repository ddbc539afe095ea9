"""Benchmark harness (driver contract): runs the headline spatial-join +
tiling pipeline at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "rows_per_sec": ...,
     "scaling": {"local8_sec": ..., "local32_sec": ..., "efficiency": ...}}

The scaling block (two-parallelism evidence for the north rule's N->4N
criterion) runs when SPARK_GRAFT_SCALING=1 (default on): the same input
at local[8] and local[32]; efficiency = (T8/T32)/4.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"
AMP = int(os.environ.get("SPARK_GRAFT_BENCH_AMP", "8"))  # point amplification
# per-query min-of-N: this host has multi-minute load phases that shift
# every timing ~1.6x (BENCH/BASELINE.md §1) — a single sample per query
# poisons the record, so the suite runs N times and each query reports
# its minimum (the same discipline the scaling legs use)
SUITE_RUNS = int(os.environ.get("SPARK_GRAFT_SUITE_RUNS", "3"))

HUB_RECTS = [
    ("nyc", 38.0, 43.0, -77.0, -71.0),
    ("london", 49.0, 54.0, -3.0, 3.0),
    ("tokyo", 33.0, 38.0, 136.0, 143.0),
    ("cdmx", 17.0, 22.0, -102.0, -96.0),
    ("saopaulo", -26.0, -21.0, -49.0, -44.0),
    ("delhi", 26.0, 31.0, 74.0, 80.0),
    ("shanghai", 29.0, 34.0, 118.0, 124.0),
    ("lagos", 4.0, 9.0, 1.0, 6.0),
    ("moscow", 53.0, 58.0, 35.0, 41.0),
    ("sydney", -36.0, -31.0, 148.0, 154.0),
    ("paris", 46.0, 51.0, 0.0, 5.0),
    ("sf", 35.0, 40.0, -125.0, -119.0),
]


def _session(threads: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{threads}]")
        .appName(f"sparkh3-bench-{threads}")
        .config("spark.sql.shuffle.partitions", str(max(threads, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _points(spark, sf_dir: str, amp: int):
    """Synthetic skewed points from events (hub arithmetic like datagen),
    amplified `amp`x to make the job parallelism-bound."""
    from pyspark.sql import functions as F

    from sparkh3.datagen import _coord_sql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # events arrive as one parquet file = one partition; spread BEFORE the
    # amplification so the explode (and everything downstream) runs wide
    par = spark.sparkContext.defaultParallelism * 2
    ev = ev.repartition(par)
    ev = ev.withColumn("_rep", F.explode(F.sequence(F.lit(1), F.lit(amp))))
    ev = ev.withColumn("_k", F.col("event_id") * amp + F.col("_rep"))
    ev.createOrReplaceTempView("_bench_events")
    lat, lng = _coord_sql("_k")
    return spark.sql(
        f"SELECT _k AS point_id, ({lat}) / 1000000.0 AS lat, "
        f"({lng}) / 1000000.0 AS lng, value FROM _bench_events"
    )


def _rect_polys(spark):
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    poly_t = ArrayType(
        ArrayType(
            StructType(
                [StructField("lng", DoubleType()), StructField("lat", DoubleType())]
            )
        )
    )
    rows = []
    for pid, y0, y1, x0, x1 in HUB_RECTS:
        ring = [
            {"lng": x0, "lat": y0},
            {"lng": x1, "lat": y0},
            {"lng": x1, "lat": y1},
            {"lng": x0, "lat": y1},
            {"lng": x0, "lat": y0},
        ]
        rows.append((pid, [ring]))
    schema = StructType(
        [StructField("poly_id", StringType()), StructField("geometry", poly_t)]
    )
    return spark.createDataFrame(rows, schema)


def run_suite(spark, sf_dir: str) -> tuple[dict, int]:
    from pyspark.sql import functions as F

    from sparkh3 import dataframe as dfo
    from sparkh3 import datagen
    from sparkh3.operators import joins, similarity, skew, spans, textops

    timings: dict[str, float] = {}
    rows_total = 0

    pts = _points(spark, sf_dir, AMP).persist()
    n_pts = pts.count()

    # q1: tile encode + skew-salted aggregate (geo_to_h3 + hot-key salting)
    t0 = time.time()
    cells = dfo.geo_to_h3(pts, 8)
    agg = skew.salted_cell_count(
        cells.select("h3_08", "value"), "h3_08", value_col="value"
    )
    agg.persist()
    agg.count()
    timings["q1_tile_encode_agg"] = round(time.time() - t0, 3)
    rows_total += n_pts

    # q2: parent rollup (native bit math) to res 4
    t0 = time.time()
    rolled = dfo.h3_to_parent_aggregate(
        agg, 4, operation="sum", h3_col="h3_08", return_geometry=False
    )
    rolled.count()
    timings["q2_parent_rollup"] = round(time.time() - t0, 3)
    rows_total += n_pts
    agg.unpersist()

    # q1b/q2b: the SAME encode+agg+rollup on the int64 cell lane — the
    # declared 100 TB storage form (latlng_to_cell_long + h3_parent_int;
    # hex strings exist for reference parity, int64 is what a real table
    # stores and what rollups run on)
    from sparkh3 import functions as H3F

    t0 = time.time()
    cells_l = pts.withColumn(
        "c8", H3F.latlng_to_cell_long_udf(8)(F.col("lat"), F.col("lng"))
    )
    agg_l = skew.salted_cell_count(
        cells_l.select("c8", "value"), "c8", value_col="value"
    )
    agg_l.persist()
    agg_l.count()
    timings["q1b_tile_encode_agg_int64"] = round(time.time() - t0, 3)
    rows_total += n_pts

    t0 = time.time()
    agg_l.groupBy(H3F.h3_parent_int(F.col("c8"), 4).alias("c4")).agg(
        F.sum("sum_value").alias("sum_value")
    ).count()
    timings["q2b_parent_rollup_int64"] = round(time.time() - t0, 3)
    rows_total += n_pts
    agg_l.unpersist()

    # q3: exact PIP join points x 12 hub polygons
    t0 = time.time()
    pip = joins.pip_join(pts, _rect_polys(spark), resolution=4)
    pip.groupBy("poly_id").count().count()
    timings["q3_pip_join"] = round(time.time() - t0, 3)
    rows_total += n_pts

    # q4: kNN (20 hub queries, k=10) against the doc points
    t0 = time.time()
    d = datagen.interleaved_documents(spark, sf_dir)
    dpts = spans.extract_geometry(d).select(
        F.col("doc_id").alias("point_id"), "lat", "lng"
    )
    queries = spark.createDataFrame(
        [(i, y0 + 2.0, (x0 + x1) / 2.0) for i, (_, y0, _, x0, x1) in enumerate(HUB_RECTS)]
        + [(100 + i, -10.0 + i, 10.0 * i) for i in range(8)],
        ["query_id", "lat", "lng"],
    )
    knn = joins.knn_join(queries, dpts, k=10, resolution=5)
    # row accounting from parquet metadata — dpts.count() would rerun
    # the whole span-extraction UDF pass just to count rows
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    knn.count()
    timings["q4_knn"] = round(time.time() - t0, 3)
    rows_total += n_docs

    # q5: polyfill tiling + compact algebra
    t0 = time.time()
    tiles = dfo.polyfill(_rect_polys(spark).repartition(len(HUB_RECTS)), 5)
    packed = dfo.h3_compact(tiles.select("poly_id", "h3_polyfill"), "h3_polyfill")
    packed.select(F.explode("h3_polyfill")).count()
    timings["q5_polyfill_compact"] = round(time.time() - t0, 3)

    # q6: minhash near-dup pass over documents
    t0 = time.time()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    textops.minhash_lsh_dedup(docs, jaccard_threshold=0.4).count()
    timings["q6_minhash_dedup"] = round(time.time() - t0, 3)
    rows_total += docs.count()

    # q7: ANN cosine top-k over embeddings
    t0 = time.time()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    similarity.cosine_topk(emb, q, k=10).count()
    timings["q7_ann_cosine"] = round(time.time() - t0, 3)
    rows_total += emb.count()

    pts.unpersist()
    return timings, rows_total


def _warmup(spark) -> None:
    """Spin up python workers / JIT / first-touch NumPy pages on every UDF
    code path before the timed section (one-time environment setup is not
    throughput — each of the 32 local workers imports numpy+kernel once)."""
    from pyspark.sql import functions as F

    from sparkh3 import functions as H3F
    from sparkh3.operators import textops, udfs

    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, 20000, 1, par)
    df = df.withColumn("lat", (F.col("id") % 120 - 60).cast("double"))
    df = df.withColumn("lng", (F.col("id") % 300 - 150).cast("double"))
    df = df.withColumn(
        "c", H3F.latlng_to_cell_udf(6)(F.col("lat"), F.col("lng"))
    )
    df = df.withColumn(
        "cl", H3F.latlng_to_cell_long_udf(6)(F.col("lat"), F.col("lng"))
    )
    df = df.withColumn("ll", H3F.cell_to_latlng_udf()(F.col("c")))
    df = df.withColumn("lll", H3F.cell_to_latlng_long_udf()(F.col("cl")))
    df = df.withColumn("ring", udfs.k_ring_udf_int(1)(F.col("c")))
    df = df.withColumn(
        "pip",
        udfs.point_in_flat_polygon_udf()(
            F.col("lat"),
            F.col("lng"),
            F.lit("w"),
            F.array(*[F.lit(x) for x in (0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0)]),
            F.array(F.lit(4)),
        ),
    )
    df = df.withColumn(
        "sig",
        textops.minhash_signature_udf(16)(
            F.array(F.xxhash64("id"), F.xxhash64("lat"))
        ),
    )
    df.count()
    _rect_polys(spark).limit(2).withColumn(
        "cv", udfs.polyfill_cover_udf(3)(F.col("geometry"))
    ).count()


def run_scaling_workload(spark, sf_dir: str, amp: int) -> int:
    """The compute-dominated core pipeline used for the N->4N scaling
    evidence: multi-resolution encode -> cell-center snap distance ->
    skew-salted aggregate -> parent rollup -> PIP join, over `amp`x
    amplified points. Returns rows processed.

    Cells ride as INT64 (the at-scale storage form — latlng_to_cell_long
    + h3_parent_int bit math): hex-string object arrays are the measured
    scaling ceiling on this host (per-row allocation page faults
    serialize across workers), and a real 100 TB table stores cell ids
    as int64 anyway.
    """
    from pyspark.sql import functions as F

    from sparkh3 import functions as H3F
    from sparkh3.operators import joins, skew

    # row count from parquet metadata (no scan, no extra pipeline job):
    # every serial fixed job in this workload deflates the measured
    # parallel speedup
    n = spark.read.parquet(f"{sf_dir}/events.parquet").count() * amp
    pts = _points(spark, sf_dir, amp).persist()
    # multi-resolution index (res 6/8/12/15 — the rollup ladder) plus
    # snap distances to the res-8 and res-12 centroids: kernel-dense,
    # byte-light narrow maps (all fused into the pre-shuffle stage)
    cells = pts
    for r in (6, 8, 12, 15):
        cells = cells.withColumn(
            f"c{r}",
            H3F.latlng_to_cell_long_udf(r)(F.col("lat"), F.col("lng")),
        )
    cells = cells.drop("c6", "c15")
    cells = cells.withColumn("_c8", H3F.cell_to_latlng_long_udf()(F.col("c8")))
    cells = cells.withColumn("_c12", H3F.cell_to_latlng_long_udf()(F.col("c12")))
    cells = cells.withColumn(
        "snap_km",
        joins.haversine_km(
            F.col("lat"), F.col("lng"), F.col("_c8.lat"), F.col("_c8.lng")
        )
        + joins.haversine_km(
            F.col("lat"), F.col("lng"), F.col("_c12.lat"), F.col("_c12.lng")
        ),
    ).drop("_c8", "_c12")
    agg = skew.salted_cell_count(
        cells.select("c8", "value"), "c8", value_col="value"
    )
    # parent rollup: pure JVM bit math on the int64 cells. ONE action
    # materializes salted-agg + rollup together — a separate count() on
    # the intermediate only adds a scheduling round that deflates the
    # measured parallel speedup without adding modeled work
    agg.groupBy(H3F.h3_parent_int(F.col("c8"), 4).alias("c4")).agg(
        F.sum("sum_value").alias("sum_value")
    ).count()
    pip = joins.pip_join(
        pts, _rect_polys(spark), resolution=4, validate_key=False
    )
    pip.groupBy("poly_id").count().count()
    pts.unpersist()
    return 2 * n  # rows through encode+agg and through the PIP join


def run_extended(spark, sf_dir: str, runs: int = 2) -> dict:
    """Round-3 training-pipeline operators, timed OUTSIDE the headline
    total (so `value` stays comparable across rounds): BM25 retrieval,
    radius geo join, and the minhash->connected-components dedup
    clustering chain. Min-of-`runs` each, same discipline as the suite."""
    import __spark_entry__ as E
    from sparkh3.operators import graph, textops

    out: dict[str, float] = {}

    def best_of(name, fn):
        t = float("inf")
        for _ in range(runs):
            t0 = time.time()
            fn()
            t = min(t, time.time() - t0)
        out[name] = round(t, 3)

    best_of("x1_bm25_search", lambda: E.q_bm25_search(spark, sf_dir).count())
    best_of("x2_radius_join", lambda: E.q_radius_join(spark, sf_dir).count())
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def cc_chain():
        pairs = textops.minhash_lsh_dedup(docs, jaccard_threshold=0.35)
        graph.connected_components(pairs, src="id_a", dst="id_b").count()

    best_of("x3_minhash_cc_clusters", cc_chain)
    # round-3 temporal/embedding operators — timed so the newest
    # additions carry a committed figure
    best_of("x4_asof_join", lambda: E.q_asof_join(spark, sf_dir).count())
    best_of("x5_sessionize", lambda: E.q_sessionize(spark, sf_dir).count())
    best_of(
        "x6_embed_centroids",
        lambda: E.q_embed_centroids(spark, sf_dir).count(),
    )
    best_of("x7_pq_ann", lambda: E.q_pq_ann(spark, sf_dir).count())
    return out


def run_leg(threads: int, sf_dir: str, runs: int = SUITE_RUNS) -> tuple[dict, int, float]:
    """Suite leg: `runs` full passes, each query reporting its MINIMUM —
    the total is the sum of per-query minimums (the clean-host figure a
    single sample can't give on this load-phased host)."""
    spark = _session(threads)
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark)
    samples: list[dict] = []
    rows = 0
    for _ in range(max(runs, 1)):
        timings, rows = run_suite(spark, sf_dir)
        samples.append(timings)
    spark.stop()
    best = {q: min(s[q] for s in samples) for q in samples[0]}
    total = round(sum(best.values()), 3)
    return best, rows, total


def run_scaling_leg(threads: int, sf_dir: str, amp: int) -> tuple[int, float]:
    spark = _session(threads)
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark)
    t0 = time.time()
    rows = run_scaling_workload(spark, sf_dir, amp)
    wall = time.time() - t0
    spark.stop()
    return rows, wall


def _probe_worker(mode: str, n_rows: int, iters: int, conn) -> None:
    """One host-bound probe process: run the pure NumPy H3 encode kernel
    over `n_rows` points `iters` times. 'fresh' allocates new input
    arrays every iteration (first-touch page-fault regime — what every
    new executor task buffer pays on this host); 'warm' reuses buffers
    after one untimed priming pass (the compute ceiling)."""
    import numpy as np

    from sparkh3.kernel import geo

    def make():
        la = (np.arange(n_rows, dtype=np.float64) % 120.0) - 60.0
        lo = (np.arange(n_rows, dtype=np.float64) % 300.0) - 150.0
        return la, lo

    if mode == "warm":
        la, lo = make()
        geo.latlng_to_cell(la, lo, 9)  # fault pages in, untimed
        t0 = time.time()
        for _ in range(iters):
            geo.latlng_to_cell(la, lo, 9)
        conn.send(time.time() - t0)
    else:
        t0 = time.time()
        for _ in range(iters):
            la, lo = make()
            geo.latlng_to_cell(la, lo, 9)
        conn.send(time.time() - t0)
    conn.close()


def _probe_throughput(mode: str, procs: int, n_rows: int, iters: int) -> float:
    import multiprocessing as mp

    ctx = mp.get_context("fork")
    pipes, ps = [], []
    for _ in range(procs):
        r, w = ctx.Pipe(duplex=False)
        p = ctx.Process(target=_probe_worker, args=(mode, n_rows, iters, w))
        p.start()
        pipes.append(r)
        ps.append(p)
    walls = [r.recv() for r in pipes]
    for p in ps:
        p.join()
    return procs * iters * n_rows / max(walls)


def host_bounds(n_rows: int = 2_000_000, repeats: int = 3) -> dict:
    """The two multiprocessing bounds this host imposes on ANY parallel
    engine (BENCH/BASELINE.md §2): fresh-allocation 1->4-process scaling
    collapses (hypervisor serializes first-touch page faults) while
    warm-buffer scaling is near-linear. The Spark pipeline necessarily
    allocates fresh Arrow/shuffle buffers per task, so its efficiency is
    bounded between these. Legs interleave (1,4,1,4,...) and each config
    takes its best-of-`repeats` throughput — same discipline as the
    Spark scaling legs, for the same reason (multi-minute load phases)."""
    out = {}
    for mode, key, iters in (
        ("fresh", "fresh_alloc_eff", 1),
        ("warm", "warm_buffer_eff", 2),
    ):
        t1 = t4 = 0.0
        for _ in range(repeats):
            t1 = max(t1, _probe_throughput(mode, 1, n_rows, iters))
            t4 = max(t4, _probe_throughput(mode, 4, n_rows, iters))
        out[key] = round(t4 / (4.0 * t1), 3)
    return out


def main() -> None:
    timings32, rows, wall32 = run_leg(CPUS, SF_DIR)
    result = {
        "metric": "spatial_join_tiling_pipeline",
        "value": round(wall32, 3),
        "unit": "sec",
        "queries": timings32,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "rows_processed": rows,
        "rows_per_sec": round(rows / wall32, 1),
        "threads": CPUS,
        "runs_per_query": SUITE_RUNS,
    }
    if os.environ.get("SPARK_GRAFT_EXTENDED", "1") == "1":
        ext = _session(CPUS)
        ext.sparkContext.setLogLevel("ERROR")
        result["extended_queries"] = run_extended(ext, SF_DIR)
        ext.stop()
    if DO_SCALING:
        # N -> 4N evidence. This sandbox's timing noise (first-touch page
        # faults ~100x, random ~15s stage stalls) swamps single runs, so
        # each leg is symmetric min-of-`runs`; N=1 vs 4N=4 because >=16
        # local threads hit the sandbox's syscall/IO pathologies
        # (measured in BENCH/BASELINE.md), which a real multi-executor
        # cluster does not share.
        # amp=100 (20M rows): big enough that per-action scheduling and
        # the driver-side PIP cover build (equal serial cost in BOTH
        # legs) amortize out of the ratio; still < 1 GiB in flight
        amp = int(os.environ.get("SPARK_GRAFT_SCALING_AMP", "100"))
        lo, hi = (
            int(x)
            for x in os.environ.get("SPARK_GRAFT_SCALING_THREADS", "1,4").split(",")
        )
        runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "5"))
        # symmetric sampling: legs are interleaved (hi, lo, hi, lo, ...)
        # so slow-host drift hits both legs equally. EVERY leg pair goes
        # into the artifact (`runs` array, each with its own quick host
        # probe) so one host phase is visible as one outlier round.
        # The headline efficiency is the MEDIAN of the per-run
        # efficiencies, each computed WITHIN its own pair — pairing the
        # best hi leg of one run with the best lo leg of another
        # systematically flatters the ratio (host phases are
        # multi-minute, so cross-run legs sample different hosts).
        # Min-of-N stays for the reported WALL TIMES only, where "best
        # observed" is the honest statistic for a noisy host.
        hi_times: list[float] = []
        lo_legs: list[tuple[int, float]] = []
        rounds: list[dict] = []
        for _ in range(runs):
            t_hi_i = run_scaling_leg(hi, SF_DIR, amp)[1]
            leg = run_scaling_leg(lo, SF_DIR, amp)
            hi_times.append(t_hi_i)
            lo_legs.append(leg)
            rounds.append(
                {
                    f"local{lo}_sec": round(leg[1], 3),
                    f"local{hi}_sec": round(t_hi_i, 3),
                    "efficiency": round((leg[1] / t_hi_i) / (hi / lo), 3),
                    # cheap per-round host probe: timestamps what the
                    # host could do while THIS pair was measured
                    "host_bounds": host_bounds(n_rows=1_000_000, repeats=1),
                }
            )
        t_hi = min(hi_times)
        rows_w = lo_legs[0][0]
        t_lo = min(t for _, t in lo_legs)
        import statistics

        eff = statistics.median(r["efficiency"] for r in rounds)
        result["scaling"] = {
            "workload_rows": rows_w,
            f"local{lo}_sec": round(t_lo, 3),
            f"local{hi}_sec": round(t_hi, 3),
            f"local{lo}_rows_per_sec": round(rows_w / t_lo, 1),
            f"local{hi}_rows_per_sec": round(rows_w / t_hi, 1),
            "efficiency": round(eff, 3),
            "efficiency_stat": "median_of_within_run_pairs",
            "runs": rounds,
            # the host's own parallel-memory context, measured in the
            # same run so the artifact carries it: a pure-NumPy
            # 1->4-process kernel probe under fresh-allocation vs
            # warm-buffer regimes. On a quiet host these have measured
            # 0.25 vs 0.94 (BENCH/BASELINE.md §2); during load phases
            # both compress toward the engine's own figure — either way
            # they timestamp what the host could do when the record was
            # taken.
            "host_bounds": host_bounds(),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
