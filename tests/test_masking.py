"""Masker op-family tests: one per mode, matching the documented semantics
of the reference Masker (SURVEY.md §4.1; reference src/models/masker.py:14-35).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_foundation_model_tpu.ops import (
    MaskParams,
    RegionSets,
    apply_mask,
    apply_mask_by_id,
    expand_timesteps,
    mode_to_id,
)

B, T, N = 4, 20, 12


@pytest.fixture
def spikes(rng):
    return jnp.asarray(rng.poisson(1.0, size=(B, T, N)).astype(np.float32))


@pytest.fixture
def regions():
    region_ids = np.repeat(np.arange(3, dtype=np.int32), N // 3)
    return RegionSets.build(region_ids)


def key(i=0):
    return jax.random.PRNGKey(i)


def test_temporal_masks_whole_timesteps(spikes):
    params = MaskParams(ratio=0.4, zero_ratio=1.0, random_ratio=0.0)
    corrupted, mask = apply_mask(key(), spikes, params, "temporal")
    mask = np.asarray(mask)
    # per-timestep masking: mask constant across channels
    assert (mask.std(axis=2) == 0).all()
    # masked positions zeroed (zero_ratio=1)
    np.testing.assert_array_equal(np.asarray(corrupted)[mask == 1], 0.0)
    # unmasked untouched
    np.testing.assert_array_equal(
        np.asarray(corrupted)[mask == 0], np.asarray(spikes)[mask == 0])
    # roughly the right fraction
    frac = mask[:, :, 0].mean()
    assert 0.1 < frac < 0.8


def test_neuron_masks_whole_channels(spikes):
    params = MaskParams(ratio=0.4)
    _, mask = apply_mask(key(1), spikes, params, "neuron")
    mask = np.asarray(mask)
    assert (mask.std(axis=1) == 0).all()
    assert 0 < mask.mean() < 1


def test_random_mode_elementwise(spikes):
    params = MaskParams(ratio=0.3)
    _, mask = apply_mask(key(2), spikes, params, "random")
    mask = np.asarray(mask)
    # element-level masking: neither time- nor channel-uniform
    assert (mask.std(axis=1) > 0).any()
    assert (mask.std(axis=2) > 0).any()
    assert abs(mask.mean() - 0.3) < 0.1


def test_co_smooth_fixed_channels(spikes):
    params = MaskParams(channels=(2, 5))
    _, mask = apply_mask(key(3), spikes, params, "co-smooth")
    mask = np.asarray(mask)
    assert (mask[:, :, [2, 5]] == 1).all()
    other = [i for i in range(N) if i not in (2, 5)]
    assert (mask[:, :, other] == 0).all()


def test_forward_pred_fixed_timesteps(spikes):
    params = MaskParams(timesteps=tuple(range(15, 20)))
    _, mask = apply_mask(key(4), spikes, params, "forward-pred")
    mask = np.asarray(mask)
    assert (mask[:, 15:, :] == 1).all()
    assert (mask[:, :15, :] == 0).all()


def test_inter_region_masks_whole_region(spikes, regions):
    params = MaskParams(n_mask_regions=1)
    _, mask = apply_mask(key(5), spikes, params, "inter-region",
                         regions=regions)
    mask = np.asarray(mask)
    region_ids = np.asarray(regions.region_ids)
    # exactly one region fully masked
    masked_neurons = np.where(mask[0, 0] == 1)[0]
    masked_regions = set(region_ids[masked_neurons].tolist())
    assert len(masked_regions) == 1
    rid = masked_regions.pop()
    np.testing.assert_array_equal(sorted(masked_neurons),
                                  np.where(region_ids == rid)[0])


def test_intra_region_targets_restricted(spikes, regions):
    params = MaskParams(ratio=0.5, n_mask_regions=1)
    _, targets = apply_mask(key(6), spikes, params, "intra-region",
                            regions=regions)
    targets = np.asarray(targets)
    region_ids = np.asarray(regions.region_ids)
    target_neurons = np.where(targets[:, 0, :].any(axis=0))[0]
    # all loss targets live in a single region
    assert len(set(region_ids[target_neurons].tolist())) <= 1


def test_causal_mode_extends_to_end(spikes):
    params = MaskParams(ratio=0.3, max_timespan=3, causal_zero=True)
    # causal uses hard ratio 0.01; with T=20 rows may have no mask at all.
    # run a larger batch to hit masked rows.
    big = jnp.tile(spikes, (8, 1, 1))
    corrupted, targets = apply_mask(key(7), big, params, "causal")
    targets = np.asarray(targets)
    corr = np.asarray(corrupted)
    # wherever a target exists, all subsequent *inputs* must be zeroed
    for b in range(targets.shape[0]):
        t_masked = np.where(targets[b, :, 0] == 1)[0]
        if len(t_masked):
            assert (corr[b, t_masked[0]:, :] == 0).all()


def test_inactive_returns_unchanged(spikes):
    params = MaskParams(ratio=0.3)
    out, mask = apply_mask(key(8), spikes, params, "temporal", active=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(spikes))
    assert np.asarray(mask).sum() == 0
    out2, mask2 = apply_mask(key(8), spikes, MaskParams(ratio=0.0), "temporal")
    assert np.asarray(mask2).sum() == 0


def test_random_ratio_corruption(spikes):
    params = MaskParams(ratio=0.5, zero_ratio=0.0, random_ratio=1.0)
    corrupted, mask = apply_mask(key(9), spikes, params, "random")
    corr, mask = np.asarray(corrupted), np.asarray(mask)
    changed = corr != np.asarray(spikes)
    # corruption only at masked positions
    assert (changed <= (mask == 1)).all()
    # random replacement bounded by max spike count
    assert corr.max() <= np.asarray(spikes).max() + 1e-6
    assert corr.min() >= 0.0


def test_expand_timesteps_static():
    mask = jnp.zeros((1, 9)).at[0, 4].set(1.0)
    out = np.asarray(expand_timesteps(mask, 3))
    np.testing.assert_array_equal(out[0], [0, 0, 0, 1, 1, 1, 0, 0, 0])
    out5 = np.asarray(expand_timesteps(mask, 5))
    np.testing.assert_array_equal(out5[0], [0, 0, 1, 1, 1, 1, 1, 0, 0])


def test_expand_prob_one_uses_span(spikes):
    params = MaskParams(ratio=0.3, expand_prob=1.0, max_timespan=4,
                        zero_ratio=1.0)
    _, mask = apply_mask(key(10), spikes, params, "temporal")
    assert np.asarray(mask).sum() > 0


def test_apply_mask_by_id_matches_static(spikes, regions):
    params = MaskParams(ratio=0.4)
    modes = ["temporal", "neuron", "random"]
    for i, mode in enumerate(modes):
        got_c, got_m = apply_mask_by_id(
            key(11), spikes, params, jnp.int32(i), modes, regions=regions)
        want_c, want_m = apply_mask(key(11), spikes, params, mode,
                                    regions=regions)
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(want_m))
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))


def test_apply_mask_by_id_jit(spikes, regions):
    params = MaskParams(ratio=0.4)
    modes = ["temporal", "neuron", "random", "inter-region", "intra-region"]

    @jax.jit
    def step(k, s, mid):
        return apply_mask_by_id(k, s, params, mid, modes, regions=regions)

    for i in range(len(modes)):
        c, m = step(key(12), spikes, jnp.int32(i))
        assert c.shape == spikes.shape
        assert np.asarray(m).sum() > 0


def test_mode_to_id():
    assert mode_to_id("temporal") == 1
    with pytest.raises(ValueError):
        mode_to_id("nope")


def test_determinism_same_key(spikes):
    params = MaskParams(ratio=0.4)
    a = apply_mask(key(13), spikes, params, "temporal")
    b = apply_mask(key(13), spikes, params, "temporal")
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    c = apply_mask(key(14), spikes, params, "temporal")
    assert not np.array_equal(np.asarray(a[1]), np.asarray(c[1]))


def test_mask_ratio_statistics_all_modes(spikes, regions):
    """Property: over many keys, the achieved masked fraction tracks the
    requested ratio for every ratio-driven mode (the sampled-count modes
    are exact per draw; Bernoulli-per-unit modes match in expectation).
    Locks ratio semantics against regressions in the Gumbel top-k /
    bernoulli sampling internals."""
    n_keys = 64
    for mode in ("temporal", "neuron", "random"):
        for ratio in (0.2, 0.5):
            params = MaskParams(ratio=ratio, zero_ratio=1.0,
                                random_ratio=0.0)
            fracs = []
            for i in range(n_keys):
                _, mask = apply_mask(key(100 + i), spikes, params, mode,
                                     regions=regions)
                fracs.append(float(np.asarray(mask).mean()))
            mean_frac = float(np.mean(fracs))
            assert abs(mean_frac - ratio) < 0.08, (
                f"{mode} ratio={ratio}: achieved {mean_frac:.3f}")


def test_mask_modes_under_vmap(spikes, regions):
    """apply_mask_by_id vmaps over per-sample keys (the multi-session
    trainer's per-batch scheme replay relies on traced scheme ids being
    batchable with independent keys)."""
    params = MaskParams(ratio=0.3, zero_ratio=1.0, random_ratio=0.0)
    keys = jax.random.split(key(7), B)
    modes = ("temporal", "neuron")
    mid = modes.index("temporal")

    def one(k, x):
        return apply_mask_by_id(k, x[None], params,
                                jnp.asarray(mid, jnp.int32), modes,
                                regions=regions)

    corrupted, mask = jax.vmap(one)(keys, spikes)
    assert corrupted.shape[0] == B and mask.shape[0] == B
    m = np.asarray(mask)[:, 0]
    # independent keys -> not all samples share one mask pattern
    assert not all((m[i] == m[0]).all() for i in range(1, B))
    # still whole-timestep masking per sample
    assert (m.std(axis=2) == 0).all()


def test_region_sampling_padding_guard(spikes):
    """A session with fewer valid regions than ``n_mask_regions`` must never
    mask padded neuron channels (VERDICT r3 Weak #5: ``_sample_regions``
    returns -1 padding ids for surplus slots; ``_member`` must not match them
    against the -1 region ids of padded channels)."""
    from multi_modal_foundation_model_tpu.ops.masking import RegionTable

    # session 0: 2 valid regions over the first 8 channels, channels 8.. padded
    ids0 = np.full(N, -1, dtype=np.int32)
    ids0[:4] = 0
    ids0[4:8] = 1
    # session 1: 4 valid regions (forces R_max > session 0's count)
    ids1 = np.repeat(np.arange(4, dtype=np.int32), N // 4)
    table = RegionTable.build([ids0, ids1])

    params = MaskParams(n_mask_regions=3, ratio=0.99, zero_ratio=1.0,
                        random_ratio=0.0)
    sets = table.select(jnp.asarray(0, jnp.int32))
    for mode in ("inter-region", "intra-region"):
        for i in range(8):
            _, mask = apply_mask(key(200 + i), spikes, params, mode,
                                 regions=sets)
            mask = np.asarray(mask)
            assert (mask[:, :, 8:] == 0).all(), (
                f"{mode}: padded channels masked (key {i})")
        # the valid regions do still get masked
        _, mask = apply_mask(key(200), spikes, params, "inter-region",
                             regions=sets)
        assert np.asarray(mask)[:, :, :8].any()
