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


# ---------------------------------------------------------------------------
# Real-trainer multi-host coverage (VERDICT r3 Weak #4 / task 4): the actual
# MultiSessionTrainer step — stitched tokenizer/head gathers, region-table
# select, device-resident gather path, stacked cross-session scan, and the
# dp x tp shard_map kernel composition — run under jax.distributed across
# 2 processes x 2 local CPU devices, and must produce the same loss and
# final-parameter checksum as the identical single-process 4-device run
# (GSPMD compiles the same global program for the same mesh shape; only the
# runtime's process layout differs).
# ---------------------------------------------------------------------------

_TRAINER_WORKER = textwrap.dedent("""
    import os, sys
    port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    dp, tp, local_dev = int(sys.argv[4]), int(sys.argv[5]), int(sys.argv[6])
    case = sys.argv[7]
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla = os.environ.get("XLA_FLAGS", "")
    xla = " ".join(f for f in xla.split()
                   if "host_platform_device_count" not in f)
    os.environ["XLA_FLAGS"] = (
        xla + f" --xla_force_host_platform_device_count={local_dev}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import tempfile
    sys.path.insert(0, %(repo)r)
    from multi_modal_foundation_model_tpu.parallel.mesh import (
        initialize_multihost, build_mesh)
    if nprocs > 1:
        initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                             num_processes=nprocs, process_id=pid)
        assert jax.process_count() == nprocs, jax.process_count()
    mesh = build_mesh(dp=dp, tp=tp)
    assert mesh is not None and mesh.devices.size == dp * tp

    from multi_modal_foundation_model_tpu.data.session import synthetic_splits
    from multi_modal_foundation_model_tpu.models.multimodal import (
        MultiModal, MultiModalConfig)
    from multi_modal_foundation_model_tpu.ops.masking import (
        MaskParams, RegionTable)
    from multi_modal_foundation_model_tpu.train import (
        MultiSessionTrainer, OptimizerConfig, TrainerConfig,
        build_multisession_loaders)

    T = 20
    sessions = {
        "s_small": synthetic_splits(seed=1, n_trials=32, n_neurons=24,
                                    n_timesteps=T, eid="s_small"),
        "s_big": synthetic_splits(seed=2, n_trials=32, n_neurons=40,
                                  n_timesteps=T, eid="s_big"),
    }
    train, val, _, meta = build_multisession_loaders(
        sessions, batch_size=8, max_time_length=T, pad_multiple=64)
    table = RegionTable.build(meta["per_session_region_ids"],
                              region_vocab=meta["region_vocab"])
    if case == "dp":        # pure DP, dropout live, stacked K=2 scan
        model_kw = dict(dropout=0.1, embed_dropout=0.1, attn_impl="xla")
        tcfg_kw = dict(steps_per_dispatch=2, stacked_scan=True)
    elif case == "shard":   # DP-sharded resident block, mixed batches
        model_kw = dict(dropout=0.0, embed_dropout=0.0, attn_impl="xla")
        tcfg_kw = dict(mixed_session_batches=True,
                       shard_resident_sessions=True, steps_per_dispatch=2)
    else:                   # dp x tp through the shard_map kernel path
        model_kw = dict(dropout=0.0, embed_dropout=0.0, attn_impl="pallas")
        tcfg_kw = {}
    model = MultiModal(MultiModalConfig(
        n_channels={"ap": meta["n_max"], "behavior": 2}, max_F=T,
        hidden_size=32, n_enc_layers=1, n_dec_layers=1, n_heads=2,
        inter_size=64, mask_params=MaskParams(ratio=0.3),
        n_sessions=len(meta["eids"]), **model_kw))
    tr = MultiSessionTrainer(
        model, train, None,
        OptimizerConfig(lr=1e-3, wd=0.01),
        TrainerConfig(num_epochs=1, log_dir=tempfile.mkdtemp(), seed=0,
                      device_resident_data=True, **tcfg_kw),
        region_table=table, eid_to_sid=meta["eid_to_sid"], mesh=mesh)
    out = tr.train_epoch(0)

    @jax.jit
    def checksum(params):
        return jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(jnp.abs(l.astype(jnp.float32))),
            params, jnp.float32(0.0))

    cs = float(checksum(tr.state.params))
    localrows = -1
    if case == "shard":
        # each process materialized ONLY its local shards' rows: its
        # addressable slice of the block is global_rows * local_dev/total
        (data, shard_eids, pools), = tr._sharded_train_cache.values()
        blk = data["spikes_data"]
        localrows = sum(s.data.shape[0] for s in blk.addressable_shards
                        if s.replica_id == 0)
        assert localrows * nprocs == blk.shape[0] * 1, (
            localrows, blk.shape)
    print(f"RESULT pid={pid} loss={out['train_loss']:.9e} cs={cs:.9e}"
          f" localrows={localrows}",
          flush=True)
""") % {"repo": REPO}


def _run_trainer_procs(nprocs, dp, tp, local_dev, case, timeout=600):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _TRAINER_WORKER, str(port), str(i),
             str(nprocs), str(dp), str(tp), str(local_dev), case],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"trainer multihost case {case} timed out")
        outs.append(out)
    results = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i}/{nprocs} failed:\n{out}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert line, f"no RESULT line from proc {i}:\n{out}"
        parts = dict(kv.split("=") for kv in line[0].split()[1:])
        results.append((float(parts["loss"]), float(parts["cs"])))
    return results


@pytest.mark.slow
@pytest.mark.parametrize("case,dp,tp",
                         [("dp", 4, 1), ("dptp", 2, 2), ("shard", 4, 1)])
def test_multisession_trainer_two_process_matches_single(case, dp, tp):
    """One MultiSessionTrainer epoch (device-resident, stitched gathers,
    stacked cross-session scan for the DP case; shard_map Pallas kernel
    for the dp x tp case; DP-SHARDED resident block with session-mixed
    stratified batches for the shard case — each process materializes
    only its own sessions, asserted inside the worker) over 2 processes
    x 2 CPU devices produces the same loss + final-param checksum as the
    single-process 4-device run."""
    multi = _run_trainer_procs(2, dp, tp, local_dev=2, case=case)
    single = _run_trainer_procs(1, dp, tp, local_dev=4, case=case)
    # both processes of the distributed run agree (replicated outputs)
    np.testing.assert_allclose(multi[0], multi[1], rtol=1e-6)
    # and match the single-process global program
    np.testing.assert_allclose(multi[0], single[0], rtol=1e-5)


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
