"""Two-process jax.distributed rehearsal of the multi-host design.

The reference has no distributed backend; our multi-host story (replicate
keys via a setup broadcast, shard the batch over DCN, psum tp partials) is
exercised here as 2 REAL processes x 4 virtual CPU devices with Gloo
collectives — the closest DCN rehearsal possible without a pod. The workers
assert every addressable output shard bit-identical to a single-device
reference; this test only drives them and checks the exit status.
"""

import subprocess
import sys

import pytest


@pytest.mark.slow
def test_multihost_two_process_rehearsal():
    # run via the module entry (spawns its own subprocesses so the parent
    # pytest process keeps its own single-process jax backend untouched)
    res = subprocess.run(
        [sys.executable, "-c",
         "from concrete_tpu.parallel import multihost; multihost.run(2, 4)"],
        capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "multihost worker matrix OK" in res.stdout, res.stdout
