"""Trainer-layer tests: schedules, checkpointing, end-to-end training loops.

Integration tests follow SURVEY.md §4 item 3: tiny synthetic session, few
epochs, loss decreases, metrics finite. DP test follows §4 item 4: sharded
training over the 8-device CPU mesh matches single-device numerics.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multi_modal_foundation_model_tpu.data.loader import make_loader
from multi_modal_foundation_model_tpu.data.session import synthetic_splits
from multi_modal_foundation_model_tpu.models.baseline import (
    BaselineDecoder, BaselineEncoder)
from multi_modal_foundation_model_tpu.models.multimodal import (
    MultiModal, MultiModalConfig)
from multi_modal_foundation_model_tpu.ops.masking import MaskParams
from multi_modal_foundation_model_tpu.train import (
    BaselineTrainer, MultiModalTrainer, OptimizerConfig, TrainerConfig,
    one_cycle_schedule, restore_checkpoint)


def tiny_loaders(n_neurons=32, n_trials=64, batch_size=16, T=20):
    splits = synthetic_splits(seed=0, n_trials=n_trials, n_neurons=n_neurons,
                              n_timesteps=T)
    kw = dict(batch_size=batch_size, max_time_length=T,
              max_space_length=n_neurons)
    train = make_loader(splits.train, **kw)
    val = make_loader(splits.val, shuffle=False, **kw)
    return train, val, splits


def tiny_model(n_neurons=32, T=20, **overrides):
    kw = dict(
        n_channels={"ap": n_neurons, "behavior": 2}, max_F=T,
        hidden_size=32, n_enc_layers=1, n_dec_layers=1, n_heads=2,
        inter_size=64, dropout=0.1, embed_dropout=0.1,
        mask_params=MaskParams(ratio=0.3), attn_impl="xla")
    kw.update(overrides)
    return MultiModal(MultiModalConfig(**kw))


# ---------------------------------------------------------------------------
# schedule parity with torch OneCycleLR
# ---------------------------------------------------------------------------

def test_one_cycle_matches_torch():
    torch = pytest.importorskip("torch")
    total, lr = 50, 1e-3
    cfg = OptimizerConfig(lr=lr, warmup_pct=0.15, div_factor=10.0)
    sched = one_cycle_schedule(cfg, total)

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    tsched = torch.optim.lr_scheduler.OneCycleLR(
        opt, total_steps=total, max_lr=lr, pct_start=0.15, div_factor=10.0)
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        tsched.step()
    # torch steps the LR *after* each optimizer step; optax schedules are
    # evaluated at the step counter — same sequence, same indexing
    ours = np.array([float(sched(i)) for i in range(total)])
    np.testing.assert_allclose(ours, np.array(torch_lrs), rtol=1e-4)


def test_one_cycle_momentum_matches_torch():
    """torch OneCycleLR cycles beta1 (0.95 -> 0.85 -> 0.95) by default and
    the reference constructs it with defaults — optimizer parity includes
    the momentum trace."""
    torch = pytest.importorskip("torch")

    import optax

    from multi_modal_foundation_model_tpu.train.schedule import (
        make_optimizer, one_cycle_momentum_schedule)

    total, lr = 40, 1e-3
    cfg = OptimizerConfig(lr=lr, warmup_pct=0.15, div_factor=10.0)
    msched = one_cycle_momentum_schedule(cfg, total)

    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    tsched = torch.optim.lr_scheduler.OneCycleLR(
        opt, total_steps=total, max_lr=lr, pct_start=0.15, div_factor=10.0)
    torch_b1 = []
    for _ in range(total):
        torch_b1.append(opt.param_groups[0]["betas"][0])
        tsched.step()
    ours = np.array([float(msched(i)) for i in range(total)])
    np.testing.assert_allclose(ours, np.array(torch_b1), rtol=1e-5)

    # the injected-hyperparams optimizer runs and reflects the schedule
    tx, _ = make_optimizer(cfg, total)
    params = {"w": jnp.zeros(3)}
    state = tx.init(params)
    grads = {"w": jnp.ones(3)}
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert np.isfinite(np.asarray(params["w"])).all()
    np.testing.assert_allclose(float(state.hyperparams["b1"]),
                               float(msched(2)), rtol=1e-5)


# ---------------------------------------------------------------------------
# baseline trainers: loss decreases, metric improves above chance
# ---------------------------------------------------------------------------

def test_baseline_decoder_trains():
    # T=100 (the real workload length): the per-trial R² metric needs enough
    # within-trial samples to go positive — at T=20 even the optimal linear
    # map scores ~0 under this metric
    train, val, splits = tiny_loaders(n_neurons=64, T=100)
    model = BaselineDecoder(in_channel=64, out_channel=2)
    tr = BaselineTrainer(
        model, train, val,
        OptimizerConfig(lr=1e-2, wd=0.01),
        TrainerConfig(num_epochs=15, log_dir="/tmp/mmfm_test_bd", seed=0),
        modal_filter={"input": ["ap"], "output": ["behavior"]})
    res = tr.train()
    h = res["history"]
    assert h[-1]["train_loss"] < h[0]["train_loss"]
    assert res["best_eval_trial_avg_r2"] > 0.0


def test_baseline_encoder_trains():
    train, val, splits = tiny_loaders()
    model = BaselineEncoder(in_channel=2, out_channel=32, seq_len=20)
    tr = BaselineTrainer(
        model, train, val,
        OptimizerConfig(lr=1e-3, wd=0.1),
        TrainerConfig(num_epochs=5, log_dir="/tmp/mmfm_test_be", seed=0),
        modal_filter={"input": ["behavior"], "output": ["ap"]})
    res = tr.train()
    h = res["history"]
    assert h[-1]["train_loss"] < h[0]["train_loss"]
    assert np.isfinite(res["best_eval_trial_avg_r2"])


# ---------------------------------------------------------------------------
# multimodal trainer: token_masking/mixed/MtM paths all run + learn
# ---------------------------------------------------------------------------

def test_multimodal_trainer_token_masking(tmp_path):
    train, val, _ = tiny_loaders()
    model = tiny_model()
    tr = MultiModalTrainer(
        model, train, val,
        OptimizerConfig(lr=1e-3, wd=0.01),
        TrainerConfig(num_epochs=3, log_dir=str(tmp_path), seed=0,
                      save_plot_every_n_epochs=2))
    res = tr.train()
    h = res["history"]
    assert h[-1]["train_loss"] < h[0]["train_loss"]
    assert np.isfinite(res["best_eval_trial_avg_r2"])
    # orbax checkpoint round-trips
    tree = restore_checkpoint(str(tmp_path), "best")
    flat_saved = jax.tree_util.tree_leaves(tree["params"])
    assert all(np.isfinite(x).all() for x in flat_saved)
    # epoch figures: periodic + best_-prefixed (reference
    # trainer/base.py:121-167 parity; wandb image logging is a no-op here)
    pngs = [p.name for p in tmp_path.glob("*.png")]
    assert any(p.startswith("gt_pred_fig_") for p in pngs)
    assert any(p.startswith("best_gt_pred_fig_") for p in pngs)


def test_multimodal_trainer_mixed_and_mtm(tmp_path):
    train, val, _ = tiny_loaders()
    model = tiny_model()
    tr = MultiModalTrainer(
        model, train, val,
        OptimizerConfig(lr=1e-3, wd=0.01),
        TrainerConfig(num_epochs=2, log_dir=str(tmp_path), seed=0,
                      mask_type="input",
                      mask_mode=("temporal", "neuron", "random",
                                 "inter-region", "intra-region"),
                      mixed_training=True))
    res = tr.train()
    assert np.isfinite(res["history"][-1]["train_loss"])


# ---------------------------------------------------------------------------
# data parallelism: mesh-sharded step == single-device step
# ---------------------------------------------------------------------------

def test_dp_matches_single_device(tmp_path):
    """Loss and gradients under a 'data'-sharded batch equal the
    single-device values (XLA psum over the mesh vs local reduce). Gradients
    are compared rather than AdamW-updated params: the first Adam step is
    ~sign(g), which amplifies f32 reduction-order noise unboundedly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("data",))

    def grads(mesh_arg, logdir):
        train, val, _ = tiny_loaders(batch_size=16)
        model = tiny_model(dropout=0.0, embed_dropout=0.0)
        tr = MultiModalTrainer(
            model, train, val,
            OptimizerConfig(lr=1e-3, wd=0.01),
            TrainerConfig(num_epochs=1, log_dir=logdir, seed=0),
            mesh=mesh_arg)
        batch = tr._device_batch(next(iter(tr.train_dataloader)))
        key = jax.random.fold_in(tr.base_key, 0)
        k_mask, _ = jax.random.split(key)

        def loss_fn(params):
            out = tr.model.apply(
                {"params": params}, tr._build_mod_inputs(batch, None),
                training=False, rngs={"mask": k_mask})
            return out.loss

        loss, g = jax.jit(jax.value_and_grad(loss_fn))(tr.state.params)
        return float(loss), jax.device_get(g)

    loss_s, g_s = grads(None, str(tmp_path / "s"))
    loss_d, g_d = grads(mesh, str(tmp_path / "d"))
    assert abs(loss_s - loss_d) < 1e-5 * max(1.0, abs(loss_s))
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_restore_old_optimizer_structure_falls_back(tmp_path):
    """A checkpoint saved with a different optimizer-state pytree (e.g.
    pre-momentum-cycling plain adamw) restores params + step with a
    warning instead of failing (RESULTS/ADVICE round-2 fix)."""
    def make_trainer(logdir, cycle):
        train, val, _ = tiny_loaders()
        model = tiny_model(dropout=0.0, embed_dropout=0.0)
        return MultiModalTrainer(
            model, train, val,
            OptimizerConfig(lr=1e-3, wd=0.01, cycle_momentum=cycle),
            TrainerConfig(num_epochs=2, log_dir=logdir, seed=0,
                          eval_every=10**9))

    tr_old = make_trainer(str(tmp_path), cycle=False)
    tr_old.train_epoch(0)
    tr_old.save_model("last", epoch=0)
    p_saved = jax.device_get(tr_old.state.params)

    tr_new = make_trainer(str(tmp_path), cycle=True)
    with pytest.warns(UserWarning, match="optimizer-state"):
        epoch = tr_new.restore("last")
    assert epoch == 0
    assert int(tr_new.state.step) == int(tr_old.state.step)
    for a, b in zip(jax.tree_util.tree_leaves(p_saved),
                    jax.tree_util.tree_leaves(
                        jax.device_get(tr_new.state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # and training continues from the restored params
    res = tr_new.train_epoch(1)
    assert np.isfinite(res["train_loss"])


def test_train_start_epoch_resume(tmp_path):
    """train(start_epoch=k) continues a restored run: remaining epochs run,
    and the best-checkpoint watermark from the meta sidecar is respected
    (a worse resumed eval must not overwrite model_best)."""
    import json
    import os

    def make_trainer(epochs):
        train, val, _ = tiny_loaders()
        model = tiny_model(dropout=0.0, embed_dropout=0.0)
        return MultiModalTrainer(
            model, train, val, OptimizerConfig(lr=1e-3, wd=0.01),
            TrainerConfig(num_epochs=epochs, log_dir=str(tmp_path), seed=0))

    tr = make_trainer(4)
    tr.train_epoch(0)
    tr.train_epoch(1)
    tr.save_model("last", epoch=1)
    tr.save_model("best", epoch=1, metric=99.0)   # unbeatable watermark

    tr2 = make_trainer(4)
    epoch = tr2.restore("last")
    assert epoch == 1
    res = tr2.train(start_epoch=epoch + 1)
    assert [r["epoch"] for r in res["history"]] == [2, 3]
    # the 99.0 watermark was recovered, so model_best meta is untouched
    meta = json.load(open(os.path.join(str(tmp_path), "model_best.json")))
    assert meta["metric"] == 99.0


def test_optimizer_config_reads_cycle_momentum():
    from multi_modal_foundation_model_tpu.config import config_from_kwargs
    cfg = config_from_kwargs({"optimizer": {
        "lr": 1e-4, "wd": 0.01, "eps": 1e-8, "cycle_momentum": False}})
    assert OptimizerConfig.from_config(cfg.optimizer).cycle_momentum is False
    cfg2 = config_from_kwargs({"optimizer": {
        "lr": 1e-4, "wd": 0.01, "eps": 1e-8}})
    assert OptimizerConfig.from_config(cfg2.optimizer).cycle_momentum is True


def test_checkpoint_resume_exact(tmp_path):
    """Resume restores params + opt_state + step exactly: training 2 epochs
    equals training 1 epoch, checkpointing, restoring, training 1 more."""
    import jax.numpy as jnp

    def make_trainer(logdir, epochs):
        train, val, _ = tiny_loaders()
        model = tiny_model(dropout=0.0, embed_dropout=0.0)
        return MultiModalTrainer(
            model, train, val, OptimizerConfig(lr=1e-3, wd=0.01),
            TrainerConfig(num_epochs=epochs, log_dir=logdir, seed=0,
                          eval_every=10**9))

    # straight-through run, 2 epochs
    tr_a = make_trainer(str(tmp_path / "a"), 2)
    tr_a.train_epoch(0)
    tr_a.train_epoch(1)
    p_straight = jax.device_get(tr_a.state.params)

    # checkpoint after epoch 0, fresh trainer, restore, epoch 1
    tr_b = make_trainer(str(tmp_path / "b"), 2)
    tr_b.train_epoch(0)
    tr_b.save_model("last", epoch=0)
    tr_c = make_trainer(str(tmp_path / "b"), 2)
    epoch = tr_c.restore("last")
    assert epoch == 0
    assert int(tr_c.state.step) == int(tr_b.state.step)
    tr_c.train_epoch(1)
    p_resumed = jax.device_get(tr_c.state.params)

    for a, b in zip(jax.tree_util.tree_leaves(p_straight),
                    jax.tree_util.tree_leaves(p_resumed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_baseline_exact_resume(tmp_path):
    """BaselineTrainer.restore + train(start_epoch): an interrupted run
    resumed from model_last reproduces the uninterrupted run's params
    exactly (VERDICT r2 Weak #6 — the multimodal trainer's resume,
    mirrored for the 2000-epoch linear-baseline runs)."""
    def make(logdir, epochs):
        train, val, _ = tiny_loaders(n_neurons=16)
        model = BaselineDecoder(in_channel=16, out_channel=2)
        return BaselineTrainer(
            model, train, val, OptimizerConfig(lr=1e-3, wd=0.01),
            TrainerConfig(num_epochs=epochs, log_dir=logdir, seed=0,
                          save_every=1),
            modal_filter={"input": ["ap"], "output": ["behavior"]})

    # uninterrupted 4-epoch run
    tr_full = make(str(tmp_path / "full"), 4)
    tr_full.train()
    p_full = jax.device_get(tr_full.state.params)

    # "killed" after 2 of 4 epochs (same schedule length!), then resumed
    tr_a = make(str(tmp_path / "resume"), 4)
    tr_a.train_epoch(0)
    tr_a.train_epoch(1)
    tr_a.save_model("last", epoch=1)
    tr_b = make(str(tmp_path / "resume"), 4)
    epoch = tr_b.restore("last")
    assert epoch == 1
    tr_b.train(start_epoch=epoch + 1)
    p_res = jax.device_get(tr_b.state.params)

    for a, b in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(p_res)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_trainer_config_from_yaml_complete(tmp_path):
    """A YAML alone expresses every trainer knob (VERDICT r4 ask #8):
    from_config must wire eval cadence, mixed_training, device-resident,
    dispatch batching, plot cadence, masker regions, and log_dir — not just
    the 5 historically-read keys."""
    from multi_modal_foundation_model_tpu.config import load_config
    from multi_modal_foundation_model_tpu.train import TrainerConfig

    yaml_path = tmp_path / "trainer.yaml"
    yaml_path.write_text("""
seed: 7
dirs:
  log_dir: /tmp/yaml_run
training:
  num_epochs: 12
  mask_type: input
  mask_mode: [neuron, temporal]
  mixed_training: true
  save_every: 3
  eval_every: 4
  save_plot_every_n_epochs: 5
  metric: rsquared
  device_resident_data: true
  prefetch_depth: 2
  steps_per_dispatch: 8
  stacked_scan: false
  mixed_session_batches: true
  shard_resident_sessions: true
  compile_retries: 3
model:
  masker:
    mask_regions: [CA1, DG]
    target_regions: [LP]
""")
    tcfg = TrainerConfig.from_config(load_config(str(yaml_path)))
    assert tcfg.num_epochs == 12
    assert tcfg.mask_type == "input"
    assert tcfg.mask_mode == ("neuron", "temporal")
    assert tcfg.mixed_training is True
    assert tcfg.save_every == 3
    assert tcfg.eval_every == 4
    assert tcfg.save_plot_every_n_epochs == 5
    assert tcfg.metric == "rsquared"
    assert tcfg.seed == 7
    assert tcfg.log_dir == "/tmp/yaml_run"
    assert tcfg.device_resident_data is True
    assert tcfg.prefetch_depth == 2
    assert tcfg.steps_per_dispatch == 8
    assert tcfg.stacked_scan is False
    assert tcfg.mixed_session_batches is True
    assert tcfg.shard_resident_sessions is True
    assert tcfg.compile_retries == 3
    assert tcfg.mask_regions == ("CA1", "DG")
    assert tcfg.target_regions == ("LP",)


def test_trainer_config_from_default_yaml_matches_defaults():
    """The shipped trainer_mm.yaml + defaults == the dataclass defaults the
    entry scripts assume (eval_every: null means every epoch)."""
    from multi_modal_foundation_model_tpu.config import (
        default_config_path, load_config)
    from multi_modal_foundation_model_tpu.train import TrainerConfig

    cfg = load_config(default_config_path("multi_modal/trainer_mm.yaml"))
    tcfg = TrainerConfig.from_config(cfg, log_dir="x")
    ref = TrainerConfig(num_epochs=2000, save_plot_every_n_epochs=5,
                        log_dir="x")
    assert tcfg == ref
