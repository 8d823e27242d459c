#!/usr/bin/env python3
"""Scale-slope measurement: run a fixed entry subset at sf0.1 and at
the ~10x synthesized directory (tools/make_scale_data.py), recording
per-entry wall time, Spark job count, and driver RSS growth at each
scale.  Output: BENCH_SCALE.json at the repo root.

The question this answers (BENCH_NOTES regime analysis): do the
shuffle-bound entries scale ~linearly in data (regime A), and do the
job-floor-bound entries hold a ~constant job count while their
distributed stages absorb the growth (regime B)?  Any entry with a
superlinear time slope or data-proportional driver memory is a scale
bug.

Usage: python tools/scale_bench.py [small_dir] [big_dir] [factor]
"""

from __future__ import annotations

import json
import os
import resource
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENTRIES = [
    # regime A (shuffle/compute-bound — expect ~linear time, flat jobs)
    "pagerank_top20",
    "wcc_placed_components",
    "cdlp_communities",
    "lcc_triangle_coorder",
    "cypher_two_hop_agg",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "corpus_pipeline_e2e",
    # regime B (job-floor-bound at toy scale — expect the floor to
    # amortize: slope well under the data factor)
    "cypher_shortest_paths",
    "ldbc_ic1_transitive_name",
    "cypher_var_length",
    "bfs_layers",
    # round-7 extensions: one entry per remaining family (vector
    # search, embedding dedup, temporal join, text metrics, weighted
    # paths, exact dedup)
    "cypher_knn",
    "semdedup_verdicts",
    "events_asof_join",
    "text_metrics",
    # round-8 extension: span-level dedup (fingerprint join over
    # exploded k-token windows)
    "substring_span_dedup",
    "sssp_weighted",
    "dedup_exact",
    # round-9 extensions: the newly gate-rotated curation operators
    # (one Lloyd round of spherical k-means; CCNet quantile bucketing)
    "embedding_kmeans",
    "quality_quantile_buckets",
]


def _semdedup_scaled_k(spark, sf_dir):
    """semdedup parameterized the way the paper scales it — k derived
    from a constant target cluster size, so k grows 10x with the data
    and the O(n^2/k) within-cluster stage stays linear.  Contrast with
    the gate's FIXED k=16 entry, whose slope is quadratic by design
    (see BENCH_NOTES round 7)."""
    from pyspark.sql import functions as F

    from samyama_graph_spark.datapipe.dedup import semdedup
    from samyama_graph_spark.loaders import load_tables

    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    out = semdedup(
        emb, "embedding", "vec_id", k=None, threshold=0.35,
        target_cluster_size=125, centroid_mode="vectorized",
    )
    return out.select("id", F.col("cluster").cast("long"), "keep")


EXTRA_ENTRIES = {"semdedup_scaled_k": _semdedup_scaled_k}


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata-sf1-synth"
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

    from samyama_graph_spark.session import get_spark
    from samyama_graph_spark.workloads import REGISTRY, load_all_workloads

    load_all_workloads()
    spark = get_spark(app_name="samyama-scale-bench")
    st = spark.sparkContext.statusTracker()

    def maxjob() -> int:
        ids = st.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    def rss_mb() -> float:
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

    def cleanup() -> None:
        import gc

        from samyama_graph_spark.cypher.engine import clear_plan_caches

        clear_plan_caches()
        gc.collect()
        for _rid, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()
        spark.sparkContext._jvm.System.gc()

    all_names = ENTRIES + list(EXTRA_ENTRIES)
    results: dict[str, dict] = {n: {} for n in all_names}
    for tag, sf_dir in (("small", small), ("big", big)):
        # warm parquet footers
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
        for name in all_names:
            fn = (
                EXTRA_ENTRIES[name]
                if name in EXTRA_ENTRIES
                else REGISTRY[name].fn
            )
            print(f"# scale[{tag}]: {name}", file=sys.stderr, flush=True)
            samples, jobs = [], []
            err = None
            for _ in range(3):
                j0, t0 = maxjob(), time.perf_counter()
                try:
                    fn(spark, sf_dir).collect()
                except Exception as e:  # noqa: BLE001
                    err = str(e)[:200]
                    break
                samples.append(time.perf_counter() - t0)
                jobs.append(maxjob() - j0)
            cleanup()
            if err or not samples:
                results[name][tag] = {"err": err}
                continue
            results[name][tag] = {
                "sec_median": round(statistics.median(samples), 3),
                "sec_cold": round(samples[0], 3),
                # warm-run job count (plan caches populated) = the
                # steady-state execution jobs; cold includes compile
                # probes
                "jobs_cold": jobs[0],
                "jobs_warm": jobs[-1],
                "rss_mb": round(rss_mb(), 1),
            }

    for name, r in results.items():
        s, b = r.get("small", {}), r.get("big", {})
        if "sec_median" in s and "sec_median" in b:
            r["time_slope"] = round(
                b["sec_median"] / max(s["sec_median"], 1e-9), 2
            )
            r["slope_vs_data"] = round(r["time_slope"] / factor, 3)
            r["jobs_flat"] = b["jobs_warm"] <= s["jobs_warm"] * 1.5 + 2

    out = {
        "factor": factor,
        "small_dir": small,
        "big_dir": big,
        "entries": results,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCALE.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(
        {n: {k: results[n].get(k) for k in ("time_slope", "jobs_flat")}
         for n in all_names},
        indent=1,
    ))
    spark.stop()


if __name__ == "__main__":
    main()
