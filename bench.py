"""Benchmark harness — one JSON line per run; --scaling for the N vs 4N
throughput-efficiency protocol (BASELINE.md).

Headline: the flagship stop→route spatial join (north-star metric:
spatial-join output rows/sec) over a deterministic synthetic page corpus,
plus operator benches over the $GRAFT_SF_DIR tables (default sf0.1).

Env:
    GRAFT_SF_DIR      table dir (default /root/testdata/sf0.1)
    RAY_GRAFT_CPUS    num_cpus for ray.init (default 32)
    GRAFT_REPLICAS    page-corpus replicas (default 300)
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time


def _pages_path(replicas: int) -> str:
    path = f"/tmp/osmray_bench_pages_r{replicas}_seed42_sharded"
    if not os.path.exists(path):
        from osmptparser_ray.sources import synthesize_pages_parquet

        synthesize_pages_parquet(path, replicas=replicas, files=64)
    return path


def run_benches(sf_dir: str, num_cpus: int, replicas: int) -> dict:
    import __ray_entry__ as entrymod

    from osmptparser_ray.pipelines.spatial_join import stop_route_spatial_join

    queries: dict[str, float] = {}

    # -- flagship: pages → PT → PIP + kNN + tiles ---------------------------
    pages = _pages_path(replicas)
    # warm OS page cache (untimed)
    for name in sorted(os.listdir(pages)):
        with open(os.path.join(pages, name), "rb") as f:
            while f.read(1 << 24):
                pass

    t0 = time.perf_counter()
    out = stop_route_spatial_join(pages)
    pip_rows = out["pip"].count()
    knn_rows = out["knn"].count()
    tile_rows = out["tiles"].count()
    flagship_s = time.perf_counter() - t0
    queries["flagship_spatial_join"] = flagship_s
    join_rows = pip_rows + knn_rows + tile_rows

    # -- operator benches over the sf tables --------------------------------
    q = entrymod.queries()
    for name in (
        "groupby_agg",
        "hash_join_revenue",
        "window_tumbling",
        "exact_dedup",
        "minhash_near_dup",
        "ann_cosine_topk",
        "spatial_knn",
        "pip_rect",
    ):
        t0 = time.perf_counter()
        res = q[name](sf_dir)
        import ray.data as rd

        n = res.count() if isinstance(res, rd.Dataset) else len(res)
        queries[name] = round(time.perf_counter() - t0, 3)
        _ = n

    total = round(sum(queries.values()), 3)
    return {
        "metric": "spatial-join output rows/sec (stop->route PIP + kNN) + operator bench total sec",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "flagship": {
            "pages_replicas": replicas,
            "join_rows": int(join_rows),
            "pip_rows": int(pip_rows),
            "knn_rows": int(knn_rows),
            "tile_rows": int(tile_rows),
            "sec": round(flagship_s, 3),
            "join_rows_per_sec": round(join_rows / flagship_s, 1),
        },
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    replicas = int(os.environ.get("GRAFT_REPLICAS", "300"))

    if "--scaling" in sys.argv:
        # two fresh processes at N and 4N CPUs on the same input — the
        # sandbox realization of the two-cluster-size rule (BASELINE.md)
        import subprocess

        lo, hi = 8, 32
        results = {}
        for n in (lo, hi):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            results[n] = json.loads(out.strip().splitlines()[-1])
        thr_lo = results[lo]["flagship"]["join_rows_per_sec"]
        thr_hi = results[hi]["flagship"]["join_rows_per_sec"]
        eff = (thr_hi / thr_lo) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": "scaling efficiency (flagship join rows/sec, 8 vs 32 cpus)",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "throughput_rows_per_sec": {str(lo): thr_lo, str(hi): thr_hi},
                    "total_sec": {
                        str(lo): results[lo]["value"],
                        str(hi): results[hi]["value"],
                    },
                    "queries": {
                        str(lo): results[lo]["queries"],
                        str(hi): results[hi]["queries"],
                    },
                }
            )
        )
        return

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    result = run_benches(sf_dir, num_cpus, replicas)
    ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
