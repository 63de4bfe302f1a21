"""Benchmark harness — prints ONE JSON line (driver contract).

Plain run: times the headline pipelines over $GRAFT_SF_DIR (default
sf0.1) in a session of $RAY_GRAFT_CPUS CPUs (default 32).
``--scaling``: runs the headline job at 8 and 32 CPUs in FRESH
subprocesses on the same input and reports both throughputs plus
scaling efficiency (the sandbox protocol for the north_rule's N vs 4N
cluster criterion; see BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_REPLICATE", "20"))


def run_bench():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from rio_color_ray.pipelines import geo
    from rio_color_ray.pipelines.flagship import flagship

    # warm the page cache + worker pool with one untimed pass
    geo.pages(SF_DIR).count()

    queries = {}

    def timed(name, make, consume=lambda ds: ds.count()):
        t0 = time.time()
        out = consume(make())
        queries[name] = round(time.time() - t0, 3)
        return out

    n_pages = timed("geocode_cellify", lambda: geo.cellified(SF_DIR, replicate=REPLICATE))
    timed("grid_cell_agg", lambda: geo.grid_cell_agg(SF_DIR))
    timed("cell_agg_salted_h8", lambda: geo.cell_agg_salted(SF_DIR, "h3_r8"))
    timed("rect_join", lambda: geo.rect_join(SF_DIR))
    timed(
        "pip_join_replicated",
        lambda: geo.pip_join_replicated(SF_DIR, replicate=REPLICATE)
        if hasattr(geo, "pip_join_replicated")
        else geo.pip_join(SF_DIR),
    )

    t0 = time.time()
    n_tiles = flagship(SF_DIR, replicate=REPLICATE, concurrency=max(2, NUM_CPUS // 4)).count()
    flag_sec = time.time() - t0
    queries["flagship"] = round(flag_sec, 3)

    result = {
        "metric": "flagship_sec (pages->geocode->cellify->pip_join->tiles->color)",
        "value": round(flag_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "replicate": REPLICATE,
        "n_pages": int(n_pages),
        "n_tiles": int(n_tiles),
        "rows_joined_tiled_per_sec": round(n_pages / flag_sec, 1),
    }
    print(json.dumps(result))
    ray.shutdown()
    return result


def run_scaling():
    def run(ncpu):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    tp_lo = r_lo["rows_joined_tiled_per_sec"]
    tp_hi = r_hi["rows_joined_tiled_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32",
                "value": round(eff, 3),
                "unit": "efficiency",
                "sec_8": r_lo["value"],
                "sec_32": r_hi["value"],
                "throughput_8": tp_lo,
                "throughput_32": tp_hi,
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        run_bench()
