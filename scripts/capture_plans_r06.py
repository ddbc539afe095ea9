"""Round-6 measurement harness (guide §1): rebuild every bench query's
DataFrame exactly as bench.py does, dump .explain("formatted") to
plans/r06/<name>_<tag>.txt, and (optionally) time each query in
isolation with the noop sink so the computation is measured without the
count()-vs-write ambiguity.

Usage:
    python scripts/capture_plans_r06.py before            # plans only
    python scripts/capture_plans_r06.py before --time     # plans + noop timings

bench.py itself stays frozen (driver contract); this harness imports its
builders so the plans match what the driver times.
"""

from __future__ import annotations

import json
import os
import sys
import time
from contextlib import redirect_stdout
from io import StringIO
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402  (frozen bench: reuse its session + inputs)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = Path(__file__).resolve().parents[1] / "plans" / "r06"


def build_queries(spark):
    """(name -> DataFrame) for every bench suite + extended query, built
    with the same operator calls bench.run_suite / run_extended use."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from sparkh3 import dataframe as dfo
    from sparkh3 import datagen
    from sparkh3 import functions as H3F
    from sparkh3.operators import (
        graph,
        joins,
        similarity,
        skew,
        spans,
        textops,
    )

    pts = bench._points(spark, SF_DIR, bench.AMP)
    out = {}

    cells = dfo.geo_to_h3(pts, 8)
    agg = skew.salted_cell_count(
        cells.select("h3_08", "value"), "h3_08", value_col="value"
    )
    out["q1_tile_encode_agg"] = agg
    out["q2_parent_rollup"] = dfo.h3_to_parent_aggregate(
        agg, 4, operation="sum", h3_col="h3_08", return_geometry=False
    )
    cells_l = pts.withColumn(
        "c8", H3F.latlng_to_cell_long_udf(8)(F.col("lat"), F.col("lng"))
    )
    agg_l = skew.salted_cell_count(
        cells_l.select("c8", "value"), "c8", value_col="value"
    )
    out["q1b_tile_encode_agg_int64"] = agg_l
    out["q2b_parent_rollup_int64"] = agg_l.groupBy(
        H3F.h3_parent_int(F.col("c8"), 4).alias("c4")
    ).agg(F.sum("sum_value").alias("sum_value"))
    out["q3_pip_join"] = (
        joins.pip_join(pts, bench._rect_polys(spark), resolution=4)
        .groupBy("poly_id")
        .count()
    )
    d = datagen.interleaved_documents(spark, SF_DIR)
    dpts = spans.extract_geometry(d).select(
        F.col("doc_id").alias("point_id"), "lat", "lng"
    )
    queries = spark.createDataFrame(
        [
            (i, y0 + 2.0, (x0 + x1) / 2.0)
            for i, (_, y0, _, x0, x1) in enumerate(bench.HUB_RECTS)
        ]
        + [(100 + i, -10.0 + i, 10.0 * i) for i in range(8)],
        ["query_id", "lat", "lng"],
    )
    out["q4_knn"] = joins.knn_join(queries, dpts, k=10, resolution=5)
    tiles = dfo.polyfill(
        bench._rect_polys(spark).repartition(len(bench.HUB_RECTS)), 5
    )
    packed = dfo.h3_compact(
        tiles.select("poly_id", "h3_polyfill"), "h3_polyfill"
    )
    out["q5_polyfill_compact"] = packed.select(F.explode("h3_polyfill"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out["q6_minhash_dedup"] = textops.minhash_lsh_dedup(
        docs, jaccard_threshold=0.4
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out["q7_ann_cosine"] = similarity.cosine_topk(emb, q, k=10)

    out["x1_bm25_search"] = E.q_bm25_search(spark, SF_DIR)
    out["x2_radius_join"] = E.q_radius_join(spark, SF_DIR)
    pairs = textops.minhash_lsh_dedup(docs, jaccard_threshold=0.35)
    out["x3_minhash_cc_clusters"] = graph.connected_components(
        pairs, src="id_a", dst="id_b"
    )
    out["x4_asof_join"] = E.q_asof_join(spark, SF_DIR)
    out["x5_sessionize"] = E.q_sessionize(spark, SF_DIR)
    out["x6_embed_centroids"] = E.q_embed_centroids(spark, SF_DIR)
    out["x7_pq_ann"] = E.q_pq_ann(spark, SF_DIR)
    return out


# queries whose builder itself runs jobs (knn_join collects its
# certificate; connected_components iterates): the DataFrame they return
# is a materialized checkpoint, so the .explain() is not the interesting
# part — time them via the builder like bench does
LAZY_ONLY = {"q4_knn", "x3_minhash_cc_clusters"}


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    do_time = "--time" in sys.argv
    only = [a for a in sys.argv[2:] if not a.startswith("--")]
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    spark = bench._session(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    if do_time:
        bench._warmup(spark)
    qs = build_queries(spark)
    timings = {}
    for name, df in qs.items():
        if only and name not in only:
            continue
        buf = StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (OUT_DIR / f"{name}_{tag}.txt").write_text(buf.getvalue())
        if do_time:
            spark.sparkContext.setJobDescription(f"r06 {tag} {name}")
            t = float("inf")
            for _ in range(2):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                t = min(t, time.time() - t0)
            timings[name] = round(t, 3)
            spark.sparkContext.setJobDescription(None)
    if do_time:
        print(json.dumps({"tag": tag, "noop_sec": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
