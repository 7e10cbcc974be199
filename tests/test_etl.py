"""ETL tests: vectorized binning vs brute-force oracle, interpolation
quality gates, trials mask, alignment, h5 reader, HF dataset round-trip."""

import numpy as np
import pytest

from multi_modal_foundation_model_tpu.data.etl import (
    align_spike_behavior, bin_behaviors, bin_spikes_per_interval,
    bin_spiking_data, create_intervals, interpolate_behavior_per_interval,
    merge_probes, trials_mask)


def brute_force_bin(times, clusters, intervals, binsize, cluster_ids):
    K = len(intervals)
    n_bins = int(np.ceil((intervals[0, 1] - intervals[0, 0]) / binsize))
    out = np.zeros((K, n_bins, len(cluster_ids)))
    cmap = {c: i for i, c in enumerate(cluster_ids)}
    for t, c in zip(times, clusters):
        if c not in cmap:
            continue
        for k, (b, e) in enumerate(intervals):
            if not (np.isfinite(b) and np.isfinite(e)):
                continue
            if b <= t < e:
                bi = int(np.floor((t - b) / binsize))
                if bi < n_bins:
                    out[k, bi, cmap[c]] += 1
    return out


def test_create_intervals():
    iv = create_intervals(0.0, 10.0, 2.0)
    np.testing.assert_allclose(iv[:, 1] - iv[:, 0], 2.0)
    assert iv[0, 0] == 0.0


def test_bin_spikes_matches_bruteforce():
    rng = np.random.default_rng(0)
    times = np.sort(rng.uniform(0, 100, size=5000))
    clusters = rng.integers(0, 12, size=5000)
    starts = np.sort(rng.uniform(0, 95, size=20))
    intervals = np.c_[starts, starts + 2.0]
    binned, ids = bin_spikes_per_interval(times, clusters, intervals,
                                          binsize=0.02)
    oracle = brute_force_bin(times, clusters, intervals, 0.02, ids)
    np.testing.assert_array_equal(binned, oracle)


def test_bin_spikes_nan_intervals_zero():
    times = np.array([0.5, 1.5])
    clusters = np.array([0, 1])
    intervals = np.array([[np.nan, np.nan], [1.0, 2.0]])
    binned, _ = bin_spikes_per_interval(times, clusters, intervals, 0.5)
    assert binned[0].sum() == 0
    assert binned[1].sum() == 1


def test_bin_spiking_data_region_subset():
    times = np.array([0.1, 0.2, 0.3, 0.4])
    clusters = np.array([0, 1, 2, 1])
    binned, ids = bin_spiking_data(
        reg_clu_ids=[1, 2], spike_times=times, spike_clusters=clusters,
        align_times=np.array([0.0]), time_window=(0.0, 0.5), binsize=0.1)
    assert list(ids) == [1, 2]
    assert binned.sum() == 3  # cluster-0 spike excluded


def test_interpolation_quality_gates():
    t = np.arange(0.0, 10.0, 0.01)
    v = np.sin(t)
    intervals = np.array([[1.0, 3.0],      # good
                          [20.0, 22.0],    # no data
                          [np.nan, np.nan]])  # bad interval
    vals, good, reasons = interpolate_behavior_per_interval(
        t, v, intervals, binsize=0.02)
    assert good.tolist() == [True, False, False]
    assert reasons[1] == "target data not present"
    x = np.linspace(1.0 + 0.02, 3.0, 100)
    np.testing.assert_allclose(vals[0], np.sin(x), atol=1e-3)


def test_trials_mask_filters():
    pd = pytest.importorskip("pandas")
    df = pd.DataFrame({
        "stimOn_times": [1.0, 2.0, 3.0, np.nan, 5.0],
        "firstMovement_times": [1.1, 2.01, 5.5, 4.2, 5.3],
        "feedback_times": [1.5, 2.5, 6.0, 4.5, 5.6],
        "goCue_times": [0.9, 1.9, 2.9, 3.9, 4.9],
        "choice": [1, -1, 1, 1, 0],
        "probabilityLeft": [0.2, 0.5, 0.8, 0.5, 0.2],
        "feedbackType": [1, 1, 1, 1, 1],
    })
    mask = trials_mask(df)
    # trial0 ok; trial1 rt 0.01 < 0.08 -> out; trial2 rt 2.5 > 2 -> out;
    # trial3 nan stimOn -> out; trial4 choice 0 -> out
    assert mask.tolist() == [True, False, False, False, False]


def test_bin_behaviors_and_align():
    pd = pytest.importorskip("pandas")
    t = np.arange(0.0, 50.0, 0.01)
    sig = np.cos(t)
    df = pd.DataFrame({
        "stimOn_times": [1.0, 10.0, 45.0],
        "choice": [1, -1, 1],
        "probabilityLeft": [0.2, 0.5, 0.8],
        "rewardVolume": [2.0, 0.0, 2.0],
        "contrastLeft": [np.nan, 0.5, np.nan],
        "contrastRight": [0.25, np.nan, 1.0],
    })
    behave_dict, mask_dict = bin_behaviors(
        {"whisker-motion-energy": (t, sig)}, trials_df=df,
        align_time="stimOn_times", time_window=(-0.5, 1.5), binsize=0.02)
    assert behave_dict["choice"].tolist() == [1, -1, 1]
    assert behave_dict["reward"].tolist() == [1, 0, 1]
    # trial at 45.0 extends past data end (46.5 > 50? no, 46.5 < 50 -> good)
    assert mask_dict["whisker-motion-energy"].tolist() == [True, True, True]

    spikes = np.ones((3, 100, 4))
    aligned_spikes, aligned_behs = align_spike_behavior(
        spikes, behave_dict, beh_names=("choice", "reward", "block",
                                        "whisker-motion-energy"))
    assert aligned_spikes.shape[0] == 3
    assert aligned_behs["whisker-motion-energy"].shape == (3, 100)


def test_align_drops_missing_trials():
    spikes = np.ones((3, 10, 2))
    behs = {"choice": np.array([1.0, -1.0, 1.0]),
            "whisker-motion-energy": np.array(
                [np.ones(10), None, np.ones(10)], dtype=object)}
    aligned_spikes, aligned_behs = align_spike_behavior(
        spikes, behs, beh_names=("choice", "whisker-motion-energy"))
    assert aligned_spikes.shape[0] == 2


def test_merge_probes():
    pd = pytest.importorskip("pandas")
    s1 = {"times": np.array([0.1, 0.5]), "clusters": np.array([0, 1])}
    c1 = pd.DataFrame({"acronym": ["CA1", "DG"]})
    s2 = {"times": np.array([0.2, 0.3]), "clusters": np.array([0, 1])}
    c2 = pd.DataFrame({"acronym": ["LP", "PO"]})
    spikes, clusters = merge_probes([s1, s2], [c1, c2])
    np.testing.assert_allclose(spikes["times"], [0.1, 0.2, 0.3, 0.5])
    np.testing.assert_array_equal(spikes["clusters"], [0, 2, 3, 1])
    assert clusters["acronym"].tolist() == ["CA1", "DG", "LP", "PO"]


def test_h5_reader_lfads(tmp_path):
    h5py = pytest.importorskip("h5py")
    from multi_modal_foundation_model_tpu.data.dataset import get_data_from_h5

    path = str(tmp_path / "lfads.h5")
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        f["train_data"] = rng.poisson(1.0, (8, 10, 5)).astype(np.float32)
        f["valid_data"] = rng.poisson(1.0, (4, 10, 5)).astype(np.float32)
        f["train_truth"] = rng.uniform(0.5, 2, (8, 10, 5)).astype(np.float32)
        f["valid_truth"] = rng.uniform(0.5, 2, (4, 10, 5)).astype(np.float32)
        f["conversion_factor"] = 2.0
    spikes, rates, heldout, fp = get_data_from_h5("train", path)
    assert spikes.shape == (8, 10, 5)
    assert rates.shape == (8, 10, 5)
    assert heldout is None and fp is None
    # log-rates path
    assert rates.min() < 0  # log of rates < 1 present


def test_create_dataset_roundtrip():
    pytest.importorskip("datasets")
    from multi_modal_foundation_model_tpu.data.dataset import create_dataset
    from multi_modal_foundation_model_tpu.data.sparse import \
        sparse_rows_to_dense

    rng = np.random.default_rng(0)
    spikes = rng.poisson(0.5, (6, 10, 8)).astype(np.float32)
    ds = create_dataset(
        spikes, eid="x", params={"binsize": 0.02, "interval_len": 2.0},
        meta_data={"eid": "x", "cluster_regions": ["CA1"] * 8},
        binned_behaviors={"choice": np.ones(6)})
    rows = ds[:]
    decoded = sparse_rows_to_dense(
        rows["spikes_sparse_data"], rows["spikes_sparse_indices"],
        rows["spikes_sparse_indptr"], rows["spikes_sparse_shape"])
    np.testing.assert_array_equal(decoded, spikes)
    assert rows["binsize"][0] == 0.02


# ---------------------------------------------------------------------------
# orchestration tier (dependency-injected fakes; reference
# ibl_data_utils.py:123-214,387-511,650-792)
# ---------------------------------------------------------------------------

class _FakeSessionLoader:
    """Duck-typed brainbox SessionLoader backed by in-memory arrays."""

    def __init__(self, trials_df, t_end=60.0, fs=200.0, broken_views=()):
        import pandas as pd

        self._trials = trials_df
        self.trials = trials_df
        t = np.arange(0.0, t_end, 1.0 / fs)
        self._wheel = pd.DataFrame({
            "times": t,
            "position": np.cumsum(np.sin(t) * 0.01),
            "velocity": np.sin(t),
        })
        self.wheel = None
        self.motion_energy = {}
        self._broken = set(broken_views)

    def load_trials(self):
        self.trials = self._trials

    def load_wheel(self):
        self.wheel = self._wheel

    def load_motion_energy(self, views):
        import pandas as pd

        for view in views:
            if view in self._broken:
                raise RuntimeError(f"camera {view} broken")
            t = np.asarray(self._wheel["times"])
            self.motion_energy[f"{view}Camera"] = pd.DataFrame({
                "times": t,
                "whiskerMotionEnergy": np.cos(t) ** 2,
            })


def _fake_trials_df(n_trials=20, t0=2.0, gap=2.5):
    import pandas as pd

    starts = t0 + gap * np.arange(n_trials)
    df = pd.DataFrame({
        "stimOn_times": starts,
        "firstMovement_times": starts + 0.3,
        "goCue_times": starts - 0.05,
        "feedback_times": starts + 1.0,
        "choice": np.where(np.arange(n_trials) % 2 == 0, 1, -1),
        "probabilityLeft": np.full(n_trials, 0.8),
        "rewardVolume": np.where(np.arange(n_trials) % 3 == 0, 0.0, 1.5),
        "contrastLeft": np.full(n_trials, np.nan),
        "contrastRight": np.full(n_trials, 0.25),
        "feedbackType": np.ones(n_trials),
    })
    # one trial too slow, one with a NaN event
    df.loc[3, "firstMovement_times"] = df.loc[3, "stimOn_times"] + 3.0
    df.loc[7, "stimOn_times"] = np.nan
    return df


def _fake_spiking_loader(rng, n_units_per_probe=6, t_end=60.0):
    def load(one, pid, eid=None, pname=None):
        import pandas as pd

        n_spikes = 4000
        times = np.sort(rng.uniform(0, t_end, n_spikes))
        clu = rng.integers(0, n_units_per_probe, n_spikes)
        spikes = {"times": times, "clusters": clu}
        clusters = pd.DataFrame({
            "channels": np.arange(n_units_per_probe),
            "acronym": rng.choice(["CA1", "DG", "LP"], n_units_per_probe),
            "label": np.ones(n_units_per_probe),
            "depths": np.sort(rng.uniform(0, 3000, n_units_per_probe)),
            "uuids": [f"{pid}-u{i}" for i in range(n_units_per_probe)],
        })
        return spikes, clusters, 30000.0
    return load


def test_load_trials_and_mask_offline():
    from multi_modal_foundation_model_tpu.data.etl import load_trials_and_mask

    df = _fake_trials_df()
    trials, mask = load_trials_and_mask(trials_df=df, max_trial_len=10.0)
    assert trials is df
    assert not mask[3]          # RT 3.0 > max_rt 2.0
    assert not mask[7]          # NaN stimOn
    assert mask.sum() == len(df) - 2


def test_load_target_behavior_dispatch():
    from multi_modal_foundation_model_tpu.data.etl import load_target_behavior

    sl = _FakeSessionLoader(_fake_trials_df())
    speed = load_target_behavior(None, "eid", "wheel-speed", sess_loader=sl)
    np.testing.assert_allclose(speed["values"],
                               np.abs(np.asarray(sl.wheel["velocity"])))
    me = load_target_behavior(None, "eid", "left-whisker-motion-energy",
                              sess_loader=sl)
    assert me["values"].shape == me["times"].shape
    # failure contract: {'skip': True}
    sl_broken = _FakeSessionLoader(_fake_trials_df(), broken_views=("left",))
    bad = load_target_behavior(None, "eid", "left-whisker-motion-energy",
                               sess_loader=sl_broken)
    assert bad.get("skip") is True


def test_collect_behavior_signals_whisker_fallback():
    from multi_modal_foundation_model_tpu.data.etl import \
        collect_behavior_signals

    sl = _FakeSessionLoader(_fake_trials_df(), broken_views=("left",))
    sig = collect_behavior_signals(None, "eid", sess_loader=sl)
    assert "whisker-motion-energy" in sig   # right camera served as fallback


def test_prepare_data_to_create_dataset_end_to_end():
    """Raw (fake) session -> prepare_data -> bin -> align -> create_dataset
    rows -> CSR decode round-trip: the full L0 pipeline offline
    (VERDICT.md Missing #2)."""
    import pandas as pd

    from multi_modal_foundation_model_tpu.data.dataset import create_dataset
    from multi_modal_foundation_model_tpu.data.etl import (
        align_spike_behavior, bin_behaviors, bin_spiking_data,
        collect_behavior_signals, load_trials_and_mask, prepare_data)
    from multi_modal_foundation_model_tpu.data.sparse import \
        sparse_rows_to_dense

    rng = np.random.default_rng(0)
    trials = _fake_trials_df()
    sl = _FakeSessionLoader(trials)
    bwm_df = pd.DataFrame({
        "eid": ["e1", "e1"],
        "subject": ["mouse-a", "mouse-a"],
        "lab": ["lab-x", "lab-x"],
        "pid": ["p1", "p2"],
        "probe_name": ["probe00", "probe01"],
    })

    def fake_trials_fn(one=None, eid=None, max_trial_len=None,
                       sess_loader=None):
        return load_trials_and_mask(trials_df=trials,
                                    max_trial_len=max_trial_len)

    def fake_behaviors_fn(one, eid, sess_loader=None):
        return {"left-whisker-motion-energy":
                {"times": np.asarray(sl._wheel["times"]),
                 "values": np.cos(np.asarray(sl._wheel["times"])) ** 2}}

    neural, behave, meta, trials_data = prepare_data(
        None, "e1", bwm_df,
        load_spiking_data_fn=_fake_spiking_loader(rng),
        load_trials_fn=fake_trials_fn,
        load_behaviors_fn=fake_behaviors_fn,
        sess_loader=sl)

    assert meta["subject"] == "mouse-a" and meta["lab"] == "lab-x"
    assert len(meta["uuids"]) == 12          # 6 units x 2 merged probes
    assert neural["spike_clusters"].max() >= 6   # re-indexed across probes

    trials_df, mask = trials_data["trials_df"], trials_data["trials_mask"]
    binsize, time_window = 0.02, (-0.5, 1.5)
    binned_spikes, _ = bin_spiking_data(
        np.arange(12), neural["spike_times"], neural["spike_clusters"],
        align_times=np.asarray(trials_df["stimOn_times"]),
        time_window=time_window, binsize=binsize)
    signals = collect_behavior_signals(None, "e1", sess_loader=sl)
    behave_dict, mask_dict = bin_behaviors(signals, trials_df=trials_df,
                                           time_window=time_window,
                                           binsize=binsize)
    aligned_spikes, aligned_behaviors = align_spike_behavior(
        binned_spikes, behave_dict, trials_mask=mask)
    expected = int((np.asarray(mask)
                    & mask_dict["whisker-motion-energy"]).sum())
    assert aligned_spikes.shape[0] == expected
    assert expected >= 16          # only the 2 bad trials (+edges) drop
    assert aligned_spikes.shape[1] == 100     # (−0.5, 1.5) / 20 ms

    ds = create_dataset(aligned_spikes, "e1",
                        params={"binsize": binsize, "interval_len": 2.0},
                        meta_data=meta, binned_behaviors=aligned_behaviors)
    rows = ds[:]
    decoded = sparse_rows_to_dense(
        rows["spikes_sparse_data"], rows["spikes_sparse_indices"],
        rows["spikes_sparse_indptr"], rows["spikes_sparse_shape"])
    np.testing.assert_array_equal(decoded, aligned_spikes)
    assert rows["eid"][0] == "e1"
    assert len(rows["whisker-motion-energy"][0]) == 100
