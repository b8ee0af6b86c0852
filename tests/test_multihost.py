"""Multi-host (2-process) data-parallel bring-up test.

Spawns two CPU processes that rendezvous through jax.distributed
(`parallel.mesh.initialize_distributed` — the DCN path of SURVEY.md §2.3),
run one shard_map DP training step over the global 2-device mesh, and
asserts the result matches a single-process 2-virtual-device run of the
identical step: the gradient psum must be process-topology-invariant.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_RUNNER = os.path.join(os.path.dirname(__file__), "multihost_runner.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    # the axon site hook initializes the XLA backend at interpreter start,
    # which forbids a later jax.distributed.initialize — disable it and pin
    # the CPU platform for the subprocesses
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    out_single = tmp_path / "single.npz"
    out_multi = tmp_path / "multi.npz"

    r = subprocess.run(
        [sys.executable, _RUNNER, "--mode", "single", "--out", str(out_single)],
        capture_output=True, text=True, timeout=900, env=_env(),
        cwd=os.path.dirname(os.path.dirname(_RUNNER)),
    )
    assert r.returncode == 0, r.stdout + r.stderr

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, _RUNNER, "--mode", "multi",
             "--process-id", str(pid), "--num-processes", "2",
             "--coordinator", f"localhost:{port}",
             "--out", str(out_multi)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=_env(), cwd=os.path.dirname(os.path.dirname(_RUNNER)),
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, so + se

    single = np.load(out_single)
    multi = np.load(out_multi)
    np.testing.assert_allclose(multi["loss"], single["loss"], rtol=1e-5)
    np.testing.assert_allclose(multi["sums"], single["sums"],
                               rtol=1e-4, atol=1e-5)
    # the sharded batch-of-pairs registration step is topology-invariant too
    np.testing.assert_array_equal(multi["rr"], single["rr"])
    np.testing.assert_allclose(multi["ir"], single["ir"], atol=1e-5)
    assert multi["rr"].shape == (2,) and multi["rr"].min() >= 0
