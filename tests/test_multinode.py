"""Multi-node smoke: the engine's exchange-bearing ops on a VIRTUAL
multi-raylet cluster (``ray.cluster_utils.Cluster`` via
``multinode_sim.py`` in a subprocess — its own Ray session, independent
of the suite's session-scoped local fixture).

Every op here crosses at least one bucketed exchange, broadcast or
actor-pool boundary, so green means those paths survive genuine
cross-raylet object transfer, not same-process shared memory. The full
393-query cross-node rehearsal lives in ``multinode_sim.py --mode
parity`` (BASELINE.md records the round-5 run); this test keeps a
representative slice in the default gate.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one representative per exchange family: fold exchange, as-of bucket
# join, sessionize split-merge, minhash actor pool + band groupby,
# graph broadcast fast path, grouped-moment finish, windowed flagship
QUERIES = ("tokenlist,asof_backward,sessionize,dedup_minhash,"
           "coreness,grouped_ols,flagship")


def test_parity_subset_on_virtual_cluster():
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # the script owns its cluster address
    env["GRAFT_SNAPSHOT_MULT"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "multinode_sim.py"),
         "--mode", "parity", "--nodes", "2", "--cpus-per-node", "2",
         "--store-gb", "1", "--queries", QUERIES],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["nodes"] == 2 and out["total_cpus"] == 4
    assert out["failures"] == []
    assert out["queries_ok"] == len(QUERIES.split(","))


def test_fault_recovery_on_virtual_cluster():
    """Kill a worker raylet mid-flagship on a 2-node cluster: the job
    must complete with the exact row count (lineage resubmission). If
    the run happens to finish before the kill lands, the row-count
    assertion still holds — the test is opportunistic about timing but
    never flaky about correctness."""
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "multinode_sim.py"),
         "--mode", "fault", "--nodes", "2", "--cpus-per-node", "2",
         "--store-gb", "1", "--sf-dir", "/root/testdata/sf0.01",
         "--mult", "300", "--kill-after", "2"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["complete"] is True
    assert out["rows"] == out["expected_rows"]
