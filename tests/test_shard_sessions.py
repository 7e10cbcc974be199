"""DP-sharded resident multi-session blocks (TrainerConfig.
shard_resident_sessions): each 'data'-axis shard holds only ITS sessions'
trials, batches gather shard-locally under shard_map, and training still
converges — the >380-session HBM-scaling path (docs/parallelism.md).
The 2-process disjoint-host-memory equivalence lives in test_multihost.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multi_modal_foundation_model_tpu.data.session import synthetic_splits
from multi_modal_foundation_model_tpu.ops.masking import RegionTable
from multi_modal_foundation_model_tpu.train import (
    MultiSessionTrainer, OptimizerConfig, TrainerConfig,
    build_multisession_loaders)

from test_multisession import T, stitched_model


def four_sessions():
    return {
        f"s{i}": synthetic_splits(seed=i, n_trials=24 + 8 * i, n_neurons=24,
                                  n_timesteps=T, eid=f"s{i}")
        for i in range(4)
    }


def make_trainer(tmp_path, mesh, **tcfg_kw):
    sessions = four_sessions()
    train, val, _, meta = build_multisession_loaders(
        sessions, batch_size=16, max_time_length=T, pad_multiple=32)
    table = RegionTable.build(meta["per_session_region_ids"],
                              region_vocab=meta["region_vocab"])
    model = stitched_model(meta["n_max"], n_sessions=len(meta["eids"]),
                           dropout=0.0, embed_dropout=0.0)
    kw = dict(num_epochs=1, log_dir=str(tmp_path), seed=0,
              mask_type="input", mask_mode=("temporal", "neuron"),
              device_resident_data=True, mixed_session_batches=True,
              shard_resident_sessions=True)
    kw.update(tcfg_kw)
    return MultiSessionTrainer(
        model, train, val, OptimizerConfig(lr=1e-3, wd=0.01),
        TrainerConfig(**kw),
        region_table=table, eid_to_sid=meta["eid_to_sid"], mesh=mesh), meta


def test_shard_assignment_balances(tmp_path):
    """Largest-first greedy assignment: disjoint cover of all eids, loads
    within one session of balanced, deterministic."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("data",))
    tr, meta = make_trainer(tmp_path, mesh)
    eids = tuple(tr.train_loaders)
    shard_eids, L = tr._shard_assignment(eids)
    assert sorted(e for grp in shard_eids for e in grp) == sorted(eids)
    loads = [sum(tr.train_loaders[e].n_trials for e in grp)
             for grp in shard_eids]
    assert L == max(loads)
    assert max(loads) - min(loads) <= max(
        tr.train_loaders[e].n_trials for e in eids)
    assert tr._shard_assignment(eids) == (shard_eids, L)


def test_sharded_block_placement_and_content(tmp_path):
    """The resident block is physically sharded on 'data' and each device's
    shard contains exactly its assigned sessions' ids (zero-padded rows
    past the shard's real trials)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("data",))
    tr, meta = make_trainer(tmp_path, mesh)
    eids = tuple(tr.train_loaders)
    data, shard_eids, pools = tr._sharded_train_data(eids)
    L = data["session_ids"].shape[0] // 4
    spikes = data["spikes_data"]
    assert spikes.sharding.spec == jax.sharding.PartitionSpec("data")
    # per-device shard bytes = 1/dp of the global block
    shard0 = spikes.addressable_shards[0]
    assert shard0.data.shape[0] == L
    sids = np.asarray(data["session_ids"])
    for s, grp in enumerate(shard_eids):
        want = [tr.eid_to_sid[e] for e in grp
                for _ in range(tr.train_loaders[e].n_trials)]
        got = sids[s * L:(s + 1) * L]
        np.testing.assert_array_equal(got[:len(want)], want)
        assert (got[len(want):] == 0).all()  # padding (never sampled)
        assert pools[s] == len(want)


def test_sharded_mixed_trainer_end_to_end(tmp_path):
    """Sharded mixed-session training: finite decreasing-ish loss, the
    epoch runs ceil(total/B) steps, determinism across identical runs,
    and the K-step scan variant matches the K=1 step count."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("data",))

    def run(sub, **kw):
        tr, meta = make_trainer(tmp_path / sub, mesh, **kw)
        out = tr.train_epoch(0)
        return tr, out

    tr1, out1 = run("a")
    assert np.isfinite(out1["train_loss"])
    total = sum(l.n_trials for l in tr1.train_loaders.values())
    n_steps = round(out1["train_loss"] / out1["train_loss_avg"])
    assert n_steps == -(-total // 16) == tr1._steps_per_epoch()

    tr2, out2 = run("b")
    np.testing.assert_allclose(out2["train_loss"], out1["train_loss"],
                               rtol=1e-6)

    trK, outK = run("k", steps_per_dispatch=3)
    assert np.isfinite(outK["train_loss"])
    assert int(trK.state.step) == int(tr1.state.step)
    assert any(k[0] == "ms-dr-shard-scan" for k in trK._train_steps)

    # eval still works (per-session loaders, replicated path)
    ev = tr1.eval_epoch()
    assert all(np.isfinite(v) for m in ev["eval_per_session"].values()
               for v in m.values())


def test_sharded_requires_mesh(tmp_path):
    tr, _ = make_trainer(tmp_path, mesh=None)
    with pytest.raises(ValueError, match="mesh"):
        tr.train_epoch(0)
