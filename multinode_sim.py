"""Simulated multi-node evidence: the engine on N virtual Ray nodes.

The sandbox has one host, so the 100-TB/256-node claim cannot run on a
real cluster; this script is the next-strongest evidence the north rule
allows: a ``ray.cluster_utils.Cluster`` with N in-process *virtual
nodes* (each its own raylet + capped object store, so every exchange
between nodes crosses the object-transfer path, not shared memory) runs
the exact same code paths. Three modes:

  parity    — the FULL driver-gate rehearsal (every ``queries()`` entry
              vs its DuckDB oracle: rows + schema + values) on the
              virtual cluster. Green == the bucketed exchanges, joins
              and broadcast paths survive real object transfer.
  flagship  — the headline pipeline at ``--mult`` snapshots/url with
              throughput, for comparison against the single-node bench.
  stress    — flagship at heavy mult with per-node object stores capped
              small (default 4 x 2 GiB), proving streaming + spill hold
              under object-store pressure (no OOM, no deadlock).

Usage (fresh process each — the cluster owns the Ray session):
  python multinode_sim.py --mode parity   --nodes 4 --cpus-per-node 8
  python multinode_sim.py --mode flagship --nodes 4 --mult 500
  python multinode_sim.py --mode stress   --nodes 4 --store-gb 2 --mult 5000

Prints one JSON line; exits non-zero on any parity failure.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time


def _quiet():
    logging.getLogger("ray").setLevel(logging.ERROR)
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def _start_cluster(nodes: int, cpus: int, store_gb: float):
    import ray
    from ray.cluster_utils import Cluster

    store = int(store_gb * 2**30)
    cluster = Cluster(
        initialize_head=True,
        head_node_args=dict(num_cpus=cpus, object_store_memory=store),
    )
    # connect the driver BEFORE adding workers so its core worker binds
    # to the head raylet deterministically — binding to a worker raylet
    # would make that worker unkillable in fault mode (killing it kills
    # the driver, not the job)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    for _ in range(nodes - 1):
        cluster.add_node(num_cpus=cpus, object_store_memory=store)
    cluster.wait_for_nodes()
    _quiet()
    alive = [n for n in ray.nodes() if n["Alive"]]
    assert len(alive) == nodes, f"wanted {nodes} nodes, got {len(alive)}"
    total_cpus = sum(int(n["Resources"].get("CPU", 0)) for n in alive)
    return cluster, {"nodes": len(alive), "total_cpus": total_cpus,
                     "store_gb_per_node": store_gb}


def run_parity(sf_dir: str, only: list[str] | None = None) -> dict:
    import duckdb

    import __ray_entry__ as entry

    from tests.util import assert_frames_match, to_pandas

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    queries, oracles = entry.queries(), entry.oracle_sql()
    if only:
        unknown = [n for n in only if n not in queries]
        assert not unknown, f"unknown queries: {unknown}"
        queries = {n: queries[n] for n in only}
    n_ok, failures = 0, []
    t0 = time.time()
    for name in sorted(queries):
        try:
            df = to_pandas(queries[name](sf_dir))
            if name in oracles:
                assert_frames_match(df, con.execute(oracles[name]).df())
            n_ok += 1
        except Exception as e:  # noqa: BLE001 — collect, report, fail
            failures.append({"query": name, "error": repr(e)[:300]})
    return {"queries_ok": n_ok, "queries_total": len(queries),
            "oracled": len(oracles), "failures": failures,
            "sec": round(time.time() - t0, 1)}


def run_flagship(sf_dir: str, mult: int) -> dict:
    from htrc_feature_reader_ray.pipelines.flagship import flagship

    t0 = time.time()
    ds = flagship(sf_dir)
    rows = ds.count()
    sec = time.time() - t0
    from htrc_feature_reader_ray.sources.pages import read_pages

    pages = read_pages(sf_dir).count()
    return {"mult": mult, "rows": rows, "pages": pages,
            "sec": round(sec, 2),
            "pages_per_sec": int(pages / sec)}


def run_fault(cluster, sf_dir: str, mult: int, kill_after: float) -> dict:
    """Start flagship, then REMOVE a worker node mid-run: Ray rebuilds
    the lost blocks from lineage and the job must complete with the
    exact row count — the node-loss story a 256-node deployment needs."""
    import threading

    from htrc_feature_reader_ray.pipelines.flagship import flagship

    result: dict = {}
    errors: list = []

    def work():
        t0 = time.time()
        try:
            result["rows"] = flagship(sf_dir).count()
            result["sec"] = round(time.time() - t0, 2)
        except BaseException as e:  # noqa: BLE001 — re-raised after join
            errors.append(e)

    import ray

    th = threading.Thread(target=work)
    th.start()
    time.sleep(kill_after)
    # never kill the node the DRIVER's core worker is bound to (ray.init
    # against a Cluster sometimes binds the driver to a worker raylet,
    # and killing that raylet kills the driver itself, not the job)
    me = ray.get_runtime_context().get_node_id()
    victim = next((n for n in cluster.worker_nodes
                   if getattr(n, "node_id", None) != me), None)
    assert victim is not None, "no killable worker node (driver-bound)"
    cluster.remove_node(victim, allow_graceful=False)
    result["killed_node_after_sec"] = kill_after
    th.join(timeout=600)
    assert not th.is_alive(), "pipeline hung after node loss"
    if errors:
        raise errors[0]  # the real recovery failure, not a KeyError
    result["nodes_alive_after"] = sum(n["Alive"] for n in ray.nodes())
    result["mult"] = mult
    result["pages_per_sec_after_loss"] = int(result["rows"]
                                             / result["sec"])
    # row-count correctness after the loss: flagship emits one row per
    # page at these settings, so compare against an independent count
    from htrc_feature_reader_ray.sources.pages import read_pages

    expected = read_pages(sf_dir).count()
    result["expected_rows"] = expected
    result["complete"] = bool(result["rows"] == expected)
    assert result["complete"], (result["rows"], expected)
    return result


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode",
                    choices=["parity", "flagship", "stress", "fault"],
                    default="parity")
    ap.add_argument("--nodes", type=int, default=4)
    ap.add_argument("--cpus-per-node", type=int, default=8)
    ap.add_argument("--store-gb", type=float, default=None,
                    help="object store GiB per node (default: 4; "
                         "stress mode defaults to 2)")
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--mult", type=int, default=500)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset for parity mode")
    ap.add_argument("--kill-after", type=float, default=5.0,
                    help="fault mode: seconds before removing a node")
    args = ap.parse_args()

    if args.mode == "parity":
        sf = args.sf_dir or "/root/testdata/sf0.001"
        os.environ["GRAFT_SNAPSHOT_MULT"] = "1"
    else:
        sf = args.sf_dir or "/root/testdata/sf0.01"
        os.environ["GRAFT_SNAPSHOT_MULT"] = str(args.mult)
    if args.store_gb is None:  # explicit values are always honored
        args.store_gb = 2.0 if args.mode == "stress" else 4.0

    _cluster, info = _start_cluster(args.nodes, args.cpus_per_node,
                                    args.store_gb)
    out = {"mode": args.mode, "sf_dir": sf, **info}
    if args.mode == "parity":
        out.update(run_parity(
            sf, args.queries.split(",") if args.queries else None))
    elif args.mode == "fault":
        out.update(run_fault(_cluster, sf, args.mult, args.kill_after))
    else:
        out.update(run_flagship(sf, args.mult))
    print(json.dumps(out))

    import ray

    ray.shutdown()
    _cluster.shutdown()
    return 1 if out.get("failures") else 0


if __name__ == "__main__":
    sys.exit(main())
