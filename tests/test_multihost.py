"""Multi-host smoke test: 2-process CPU ``jax.distributed`` DP step.

Exercises ``parallel.mesh.initialize_multihost`` (VERDICT.md Weak #6: the
multi-host path previously had zero coverage) with a real coordinator:
two separate python processes each own 2 virtual CPU devices, initialize
through the local coordination service, build ONE global 4-device 'data'
mesh, and compute a data-parallel gradient of a shared linear model over a
globally-sharded batch. Every process must see the same psum-reduced
gradient, equal to the single-host numpy computation of the full batch.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import os, sys
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla = os.environ.get("XLA_FLAGS", "")
    xla = " ".join(f for f in xla.split()
                   if "host_platform_device_count" not in f)
    os.environ["XLA_FLAGS"] = (
        xla + " --xla_force_host_platform_device_count=2").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, %(repo)r)
    from multi_modal_foundation_model_tpu.parallel.mesh import (
        initialize_multihost, build_mesh, batch_sharding,
        replicated_sharding)

    initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    mesh = build_mesh()
    assert mesh is not None and mesh.devices.size == 4

    # global batch (B=8) deterministic on every host; each host feeds its
    # local quarter-shards, assembled into one global array
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(8, 4)).astype(np.float32)
    ys = rng.normal(size=(8,)).astype(np.float32)
    w = np.linspace(0.1, 0.4, 4).astype(np.float32)

    sh = batch_sharding(mesh)
    gx = jax.make_array_from_process_local_data(sh, xs[4 * pid:4 * pid + 4])
    gy = jax.make_array_from_process_local_data(sh, ys[4 * pid:4 * pid + 4])
    gw = jax.device_put(jnp.asarray(w), replicated_sharding(mesh))

    @jax.jit
    def grad_fn(w, x, y):
        return jax.grad(lambda w: jnp.mean((x @ w - y) ** 2))(w)

    g = np.asarray(grad_fn(gw, gx, gy))      # psum over 'data' via GSPMD
    expected = 2.0 * (xs.T @ (xs @ w - ys)) / len(ys)
    np.testing.assert_allclose(g, expected, rtol=1e-5)
    print(f"proc {pid}: ok grad[0]={g[0]:.6f}")
""") % {"repo": REPO}


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_dp_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, str(port), str(i)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host smoke test timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: ok" in out
