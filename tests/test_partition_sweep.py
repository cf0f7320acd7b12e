"""Every oracled contract query must be partitioning-invariant.

Runs scripts/partition_sweep.py in a SUBPROCESS because a JVM hosts
one SparkSession: the conftest session pins local[4]/8, and the sweep
needs a genuinely different master and shuffle count (coprime to the
defaults) for the invariance check to mean anything."""

import subprocess
import sys


def test_all_oracled_queries_partitioning_invariant():
    proc = subprocess.run(
        [sys.executable, "scripts/partition_sweep.py",
         "/root/testdata/sf0.001", "local[3]", "5"],
        cwd="/root/repo", capture_output=True, text=True, timeout=900,
    )
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-15:])
    assert proc.returncode == 0, tail
    assert "0 failures" in proc.stdout, tail
