"""Utils tests: plotting figures render, seeding, profiling accounting."""

import numpy as np

import jax
import jax.numpy as jnp

from multi_modal_foundation_model_tpu.utils import (MFUTracker, StepTimer,
                                                    plot_gt_pred,
                                                    plot_neurons_r2, set_seed)


def test_set_seed_reproducible():
    set_seed(7, verbose=False)
    a = np.random.rand(3)
    set_seed(7, verbose=False)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


def test_plot_functions_render():
    rng = np.random.default_rng(0)
    gt = rng.poisson(1.0, (20, 50)).astype(float)
    pred = gt + rng.normal(scale=0.1, size=gt.shape)
    fig = plot_gt_pred(gt, pred, epoch=3, modality="ap")
    assert fig is not None
    fig2 = plot_neurons_r2(gt, pred, epoch=3, neuron_idx=[0, 1])
    assert fig2 is not None
    import matplotlib.pyplot as plt
    plt.close("all")


def test_viz_single_cell_figure_renders():
    """Full reference viz_single_cell layout: PSTH row + PSTH-subtracted
    obs/pred/residual rasters (eval_utils.py:1348-1388)."""
    from multi_modal_foundation_model_tpu.eval.metrics import \
        create_behavior_conditions
    from multi_modal_foundation_model_tpu.utils.plotting import \
        viz_single_cell_figure

    rng = np.random.default_rng(0)
    K, T = 24, 30
    choice = rng.choice([-1.0, 1.0], K)
    reward = rng.choice([0.0, 1.0], K)
    block = rng.choice([0.2, 0.5, 0.8], K)
    X, var_name2idx, var_tasklist, var_value2label, var_behlist = \
        create_behavior_conditions(choice, reward, block, T=T)
    y = rng.poisson(1.0, (K, T)).astype(float)
    y_pred = y + rng.normal(scale=0.2, size=y.shape)
    fig = viz_single_cell_figure(
        X, y, y_pred, var_tasklist, var_name2idx,
        var_value2label=var_value2label, var_behlist=var_behlist,
        neuron_idx=7, neuron_region="CA1", method="mm",
        r2_pair=(0.5, 0.4))
    # 3 PSTH axes + 4 single-trial rows (plus colorbars)
    assert len(fig.axes) >= 7
    import matplotlib.pyplot as plt
    plt.close("all")


def test_viz_unaligned_figure_renders():
    from multi_modal_foundation_model_tpu.utils.plotting import \
        viz_single_cell_unaligned_figure

    rng = np.random.default_rng(1)
    gt = rng.poisson(1.0, (24, 40)).astype(float)
    pred = gt + rng.normal(scale=0.3, size=gt.shape)
    fig = viz_single_cell_unaligned_figure(gt, pred, neuron_idx=3,
                                           neuron_region="PO", method="mm",
                                           r2=0.4)
    assert len(fig.axes) >= 3
    import matplotlib.pyplot as plt
    plt.close("all")


def test_step_timer_warmup():
    t = StepTimer(warmup=2)
    for _ in range(5):
        with t:
            pass
    assert len(t.times) == 3
    assert t.steps_per_sec() > 0


def test_mfu_from_compiled_step():
    x = jnp.ones((128, 128))

    def f(a):
        return a @ a

    compiled = jax.jit(f).lower(x).compile()
    mfu = MFUTracker(compiled, peak_flops=1e12)
    # 128^3 * 2 flops for a matmul
    assert mfu.flops_per_step >= 2 * 128 ** 3 * 0.9
    assert 0 < mfu.mfu(1e-3) < 1.0

    flops = MFUTracker.flops_of(f, x)
    assert flops == mfu.flops_per_step


def test_aot_compile_retries_transient(monkeypatch):
    """aot_compile: the lowered program's .compile() is retried (with
    backoff) on transient remote-compile markers, raises immediately on
    anything else, and the compiled executable runs."""
    import jax
    import jax.numpy as jnp
    from multi_modal_foundation_model_tpu.utils.prewarm import aot_compile

    jitted = jax.jit(lambda x: x * 2 + 1)
    x = jnp.arange(4.0)

    # happy path: executable computes
    exe = aot_compile(jitted, x, retries=0)
    assert float(exe(x)[3]) == 7.0

    # transient failures then success
    calls = {"n": 0}
    real_lower = jitted.lower

    class FlakyLowered:
        def __init__(self, lowered):
            self._lowered = lowered

        def compile(self):
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError(
                    "INTERNAL: stream removed: remote_compile: read body: "
                    "response body closed")
            return self._lowered.compile()

    flaky = jax.jit(lambda x: x - 1)
    monkeypatch.setattr(
        flaky, "lower", lambda *a, **k: FlakyLowered(real_lower(*a, **k)),
        raising=False)
    slept = []
    import multi_modal_foundation_model_tpu.utils.prewarm as pw
    monkeypatch.setattr(pw.time, "sleep", slept.append)
    exe = pw.aot_compile(flaky, x, retries=3, backoff_s=2.0,
                         log=lambda m: None)
    assert calls["n"] == 3
    assert slept == [2.0, 4.0]   # exponential backoff
    assert float(exe(x)[0]) == 1.0

    # non-transient: raise immediately
    calls["n"] = -10**9
    with __import__("pytest").raises(RuntimeError):
        pw.aot_compile(flaky, x, retries=3, backoff_s=0.0,
                       log=lambda m: None)


def test_retry_transient_wrapper():
    """retry_transient: retries only transient markers, preserves the
    return value, gives up after the budget."""
    from multi_modal_foundation_model_tpu.utils.prewarm import retry_transient
    import multi_modal_foundation_model_tpu.utils.prewarm as pw
    import pytest

    pw_sleep, pw.time.sleep = pw.time.sleep, lambda s: None
    try:
        state = {"n": 0}

        def flaky():
            state["n"] += 1
            if state["n"] < 3:
                raise RuntimeError("UNAVAILABLE: remote_compile flake")
            return 42

        assert retry_transient(flaky, retries=3, log=lambda m: None)() == 42
        assert state["n"] == 3

        def hard():
            raise ValueError("a real bug")

        with pytest.raises(ValueError):
            retry_transient(hard, retries=3, log=lambda m: None)()

        state["n"] = 0
        with pytest.raises(RuntimeError):
            retry_transient(flaky, retries=1, log=lambda m: None)()
    finally:
        pw.time.sleep = pw_sleep

    # retries=0 returns fn unchanged
    f = lambda: 1
    assert retry_transient(f, retries=0) is f
