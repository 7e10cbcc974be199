"""Device-resident data path: HBM-resident split + on-device gather must
reproduce the host-loader path exactly (same batches, same masks for the
padded tail, same losses), while removing per-batch host->device copies.
"""

import numpy as np
import pytest
import jax

from multi_modal_foundation_model_tpu.train import (
    MultiModalTrainer, OptimizerConfig, TrainerConfig)

from test_trainer import tiny_loaders, tiny_model


def _trainer(tmp_path, device_resident, sub, n_trials=56, batch_size=16):
    # 56 trials / batch 16 -> a padded final batch exercises the valid-mask
    train, val, _ = tiny_loaders(n_trials=n_trials, batch_size=batch_size)
    model = tiny_model(dropout=0.0, embed_dropout=0.0)
    return MultiModalTrainer(
        model, train, val, OptimizerConfig(lr=1e-3, wd=0.01),
        TrainerConfig(num_epochs=2, log_dir=str(tmp_path / sub), seed=0,
                      mixed_training=True, mask_type="input",
                      mask_mode=("temporal", "neuron"),
                      device_resident_data=device_resident))


def test_index_batches_match_host_batches():
    train, _, _ = tiny_loaders(n_trials=56, batch_size=16)
    host = list(train)
    train.set_epoch(0)
    idxb = list(train.iter_index_batches())
    train.set_epoch(0)
    host = list(train)
    assert len(host) == len(idxb)
    for hb, (idx, valid, n_real) in zip(host, idxb):
        assert n_real == hb["n_real"]
        np.testing.assert_array_equal(
            hb["spikes_data"], train.arrays["spikes_data"][idx])
        # padded tail must be marked invalid
        assert valid[:n_real].all() and not valid[n_real:].any()


def test_device_resident_matches_host_training(tmp_path):
    tr_h = _trainer(tmp_path, False, "h")
    tr_d = _trainer(tmp_path, True, "d")
    for epoch in range(2):
        res_h = tr_h.train_epoch(epoch)
        res_d = tr_d.train_epoch(epoch)
        np.testing.assert_allclose(res_h["train_loss"], res_d["train_loss"],
                                   rtol=2e-5)
    ev_h = tr_h.eval_epoch()
    ev_d = tr_d.eval_epoch()
    np.testing.assert_allclose(ev_h["eval_loss"], ev_d["eval_loss"],
                               rtol=2e-5)
    np.testing.assert_allclose(ev_h["eval_trial_avg_r2"],
                               ev_d["eval_trial_avg_r2"], rtol=1e-4)
    for mod in ("ap", "behavior"):
        np.testing.assert_allclose(ev_h["eval_preds"][mod],
                                   ev_d["eval_preds"][mod],
                                   rtol=1e-4, atol=1e-5)


def test_steps_per_dispatch_scan_matches_single(tmp_path):
    """K-step lax.scan dispatch == K single-step dispatches: without mixed
    objectives the host RNG draw order is identical, so the training
    trajectories must match (MtM scheme ids are scanned operands)."""
    def mk(K, sub):
        train, val, _ = tiny_loaders(n_trials=64, batch_size=16)
        model = tiny_model(dropout=0.0, embed_dropout=0.0)
        return MultiModalTrainer(
            model, train, val, OptimizerConfig(lr=1e-3, wd=0.01),
            TrainerConfig(num_epochs=1, log_dir=str(tmp_path / sub), seed=0,
                          mask_type="input",
                          mask_mode=("temporal", "neuron"),
                          device_resident_data=True,
                          steps_per_dispatch=K))

    tr1 = mk(1, "k1")
    tr4 = mk(4, "k4")
    for epoch in range(2):
        r1 = tr1.train_epoch(epoch)
        r4 = tr4.train_epoch(epoch)
        np.testing.assert_allclose(r1["train_loss"], r4["train_loss"],
                                   rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(tr1.state.params),
                    jax.tree_util.tree_leaves(tr4.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_steps_per_dispatch_remainder(tmp_path):
    # 96 trials -> 76-trial train split -> 5 batches with K=2: two scan
    # groups + one single-step remainder (which is also a padded batch)
    train, val, _ = tiny_loaders(n_trials=96, batch_size=16)
    tr = MultiModalTrainer(
        tiny_model(), train, val, OptimizerConfig(lr=1e-3),
        TrainerConfig(num_epochs=1, log_dir=str(tmp_path), seed=0,
                      device_resident_data=True, steps_per_dispatch=2))
    res = tr.train_epoch(0)
    assert np.isfinite(res["train_loss"])
    assert int(tr.state.step) == 5


def test_multisession_device_resident_matches_host(tmp_path):
    from multi_modal_foundation_model_tpu.data.session import synthetic_splits
    from multi_modal_foundation_model_tpu.ops.masking import RegionTable
    from multi_modal_foundation_model_tpu.train import (
        MultiSessionTrainer, build_multisession_loaders)

    T = 20

    def mk(device_resident, sub):
        sessions = {
            "a": synthetic_splits(seed=1, n_trials=40, n_neurons=24,
                                  n_timesteps=T, eid="a"),
            "b": synthetic_splits(seed=2, n_trials=40, n_neurons=40,
                                  n_timesteps=T, eid="b"),
        }
        train, val, _, meta = build_multisession_loaders(
            sessions, batch_size=16, max_time_length=T, pad_multiple=64)
        table = RegionTable.build(meta["per_session_region_ids"],
                                  region_vocab=meta["region_vocab"])
        from test_multisession import stitched_model
        model = stitched_model(meta["n_max"])
        # dropout off for exact cross-path comparison
        import dataclasses as dc
        model = type(model)(dc.replace(model.config, dropout=0.0,
                                       embed_dropout=0.0))
        tr = MultiSessionTrainer(
            model, train, val, OptimizerConfig(lr=1e-3, wd=0.01),
            TrainerConfig(num_epochs=1, log_dir=str(tmp_path / sub), seed=0,
                          mask_type="input", mask_mode=("temporal",),
                          mixed_training=True,
                          device_resident_data=device_resident),
            region_table=table, eid_to_sid=meta["eid_to_sid"])
        return tr

    tr_h = mk(False, "h")
    tr_d = mk(True, "d")
    res_h = tr_h.train_epoch(0)
    res_d = tr_d.train_epoch(0)
    np.testing.assert_allclose(res_h["train_loss"], res_d["train_loss"],
                               rtol=2e-5)
    ev_h = tr_h.eval_epoch()
    ev_d = tr_d.eval_epoch()
    np.testing.assert_allclose(ev_h["eval_loss"], ev_d["eval_loss"],
                               rtol=2e-5)
    np.testing.assert_allclose(ev_h["eval_trial_avg_r2"],
                               ev_d["eval_trial_avg_r2"], rtol=1e-4)


def test_device_resident_with_dp_mesh(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("data",))
    train, val, _ = tiny_loaders(n_trials=64, batch_size=16)
    model = tiny_model(dropout=0.0, embed_dropout=0.0)
    tr = MultiModalTrainer(
        model, train, val, OptimizerConfig(lr=1e-3, wd=0.01),
        TrainerConfig(num_epochs=1, log_dir=str(tmp_path), seed=0,
                      device_resident_data=True),
        mesh=mesh)
    res = tr.train_epoch(0)
    assert np.isfinite(res["train_loss"])
