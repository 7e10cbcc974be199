"""Mock-fixture tests for the ETL *network seam* itself.

`tests/test_etl.py` drives the orchestration tier through injected loader
fns; these tests instead install fake ``brainbox``/``iblatlas`` modules in
``sys.modules`` so the REAL network wrappers run end-to-end against a fake
ONE API (VERDICT r3 Missing #3): ``load_spiking_data``'s QC filter +
cluster remap (reference ``ibl_data_utils.py:27-72``), the
``one.load_object`` behavior paths (``:387-511``), ``list_brain_regions``
(``:217-223``), and ``prepare_data`` with its DEFAULT loader hooks
(``:740-792``).
"""

import sys
import types

import numpy as np
import pytest

from tests.test_etl import _fake_trials_df, _FakeSessionLoader

EID = "fake-eid"


# ---------------------------------------------------------------------------
# fake IBL stack
# ---------------------------------------------------------------------------

class _FakeONE:
    """Duck-typed ONE API: per-probe spike sortings + camera objects."""

    def __init__(self, rng, n_units=6, t_end=60.0):
        self.probes = {}
        for pid in ("p1", "p2"):
            n_spikes = 3000
            self.probes[pid] = {
                "spikes": {
                    "times": np.sort(rng.uniform(0, t_end, n_spikes)),
                    "clusters": rng.integers(0, n_units, n_spikes),
                },
                "labels": np.where(np.arange(n_units) % 3 == 0, 0.5, 1.0),
                "acronyms": rng.choice(["CA1", "DG", "LP"], n_units),
            }
        t = np.arange(0.0, t_end, 0.02)
        self._camera = types.SimpleNamespace(
            times=t,
            features=types.SimpleNamespace(
                pupilDiameter_smooth=np.sin(t) ** 2),
            dlc="fake-dlc-table",
        )

    def load_object(self, eid, obj, attribute=None, collection=None):
        assert eid == EID and obj.endswith("Camera")
        return self._camera


class _FakeSpikeSortingLoader:
    def __init__(self, one=None, pid=None, **kwargs):
        self._data = one.probes[pid]
        self._pid = pid

    def load_spike_sorting(self):
        d = self._data
        import pandas as pd
        n = len(d["labels"])
        clusters = pd.DataFrame({
            "channels": np.arange(n),
            "acronym": d["acronyms"],
            "label": d["labels"],
            "depths": np.linspace(100, 3000, n),
            "uuids": [f"{self._pid}-u{i}" for i in range(n)],
        })
        return d["spikes"], clusters, {"rawInd": np.arange(n)}

    def merge_clusters(self, spikes, clusters, channels,
                       compute_metrics=False):
        df = clusters
        return types.SimpleNamespace(to_df=lambda: df)

    def raw_electrophysiology(self, band="ap", stream=True):
        return types.SimpleNamespace(fs=30000.0)


@pytest.fixture
def fake_ibl_stack(monkeypatch):
    """Install fake brainbox/iblatlas packages so the network-gated imports
    inside etl.py resolve to the fakes."""
    bb = types.ModuleType("brainbox")
    bb_io = types.ModuleType("brainbox.io")
    bb_io_one = types.ModuleType("brainbox.io.one")
    bb_io_one.SpikeSortingLoader = _FakeSpikeSortingLoader
    bb_io_one.SessionLoader = _FakeSessionLoader
    bb_beh = types.ModuleType("brainbox.behavior")
    bb_beh.dlc = types.SimpleNamespace(
        get_speed=lambda dlc, times, camera, feature:
            np.full(len(times), {"paw_l": 1.0, "paw_r": 2.0,
                                 "nose_tip": 3.0}[feature]))
    bb.io, bb_io.one, bb.behavior = bb_io, bb_io_one, bb_beh
    ia = types.ModuleType("iblatlas")
    ia_regions = types.ModuleType("iblatlas.regions")

    class _FakeBrainRegions:
        def acronym2acronym(self, acronyms, mapping="Beryl"):
            assert mapping == "Beryl"
            return np.asarray(acronyms)  # identity Beryl map

    ia_regions.BrainRegions = _FakeBrainRegions
    ia.regions = ia_regions
    for name, mod in [("brainbox", bb), ("brainbox.io", bb_io),
                      ("brainbox.io.one", bb_io_one),
                      ("brainbox.behavior", bb_beh),
                      ("iblatlas", ia), ("iblatlas.regions", ia_regions)]:
        monkeypatch.setitem(sys.modules, name, mod)
    rng = np.random.default_rng(7)
    return _FakeONE(rng)


# ---------------------------------------------------------------------------
# the wrappers themselves
# ---------------------------------------------------------------------------

def test_load_spiking_data_qc_and_remap(fake_ibl_stack):
    from multi_modal_foundation_model_tpu.data.etl import load_spiking_data

    one = fake_ibl_stack
    spikes, clusters, fs = load_spiking_data(one, "p1", qc=1.0)
    labels = one.probes["p1"]["labels"]
    good = np.flatnonzero(labels >= 1.0)
    # QC filter dropped the label-0.5 units (indices 0, 3 of 6)
    assert len(clusters) == len(good)
    assert fs == 30000.0
    # spikes of dropped clusters removed; survivors remapped to 0..n_good-1
    raw = one.probes["p1"]["spikes"]
    kept = np.isin(raw["clusters"], good)
    assert len(spikes["times"]) == int(kept.sum())
    assert set(np.unique(spikes["clusters"])) <= set(range(len(good)))
    # remap preserves identity: spike counts per original cluster match
    for new_i, old_i in enumerate(good):
        assert (spikes["clusters"] == new_i).sum() == \
            (raw["clusters"] == old_i).sum()
    # original metadata rides along at the remapped rows
    np.testing.assert_array_equal(
        clusters["acronym"].to_numpy(), one.probes["p1"]["acronyms"][good])


def test_load_target_behavior_one_api_paths(fake_ibl_stack):
    from multi_modal_foundation_model_tpu.data.etl import load_target_behavior

    one = fake_ibl_stack
    pupil = load_target_behavior(one, EID, "left-pupil-diameter")
    assert pupil["values"].shape == pupil["times"].shape
    assert not pupil.get("skip")

    paw = load_target_behavior(one, EID, "left-camera-right-paw-speed")
    assert (paw["values"] == 2.0).all()          # dlc.get_speed paw_r
    nose = load_target_behavior(one, EID, "right-nose-speed")
    assert (nose["values"] == 3.0).all()         # dlc.get_speed nose_tip

    # unknown targets raise (NotImplementedError passes through the
    # skip-contract net, reference ibl_data_utils.py:504)
    with pytest.raises(NotImplementedError):
        load_target_behavior(one, EID, "tail-speed")

    # failing ONE load -> {'skip': True}
    broken = types.SimpleNamespace(load_object=_raise)
    bad = load_target_behavior(broken, EID, "left-pupil-diameter")
    assert bad.get("skip") is True


def _raise(*a, **k):
    raise IOError("ONE download failed")


def test_list_brain_regions_beryl(fake_ibl_stack):
    from multi_modal_foundation_model_tpu.data.etl import (
        list_brain_regions, select_brain_regions)

    acronyms = np.array(["CA1", "DG", "CA1", "LP"])
    regions, beryl = list_brain_regions(acronyms)
    assert sorted(regions[0]) == ["CA1", "DG", "LP"]
    regions_single, _ = list_brain_regions(acronyms, single_region=True)
    assert [r[0] for r in regions_single] == ["CA1", "DG", "LP"]
    np.testing.assert_array_equal(
        select_brain_regions(beryl, ["CA1"]), [0, 2])


def test_prepare_data_default_loaders(fake_ibl_stack):
    """prepare_data with its DEFAULT hooks: real load_spiking_data over the
    fake SpikeSortingLoader (both probes, QC + merge + re-index), real
    load_trials_and_mask over the fake SessionLoader, real
    load_anytime_behaviors fanning threads over load_target_behavior."""
    import pandas as pd

    from multi_modal_foundation_model_tpu.data.etl import prepare_data

    one = fake_ibl_stack
    sl = _FakeSessionLoader(_fake_trials_df())
    bwm_df = pd.DataFrame({
        "eid": [EID, EID],
        "subject": ["mouse-a", "mouse-a"],
        "lab": ["lab-x", "lab-x"],
        "pid": ["p1", "p2"],
        "probe_name": ["probe00", "probe01"],
    })
    neural, behave, meta, trials_data = prepare_data(
        one, EID, bwm_df, sess_loader=sl)

    n_good = sum(int((one.probes[p]["labels"] >= 1.0).sum())
                 for p in ("p1", "p2"))
    assert len(meta["uuids"]) == n_good
    assert meta["sampling_freq"] == 30000.0
    assert all(g == 1 for g in meta["good_clusters"])  # QC already applied
    # merged spike train is time-sorted with re-indexed clusters
    assert (np.diff(neural["spike_times"]) >= 0).all()
    assert neural["spike_clusters"].max() == n_good - 1
    assert len(neural["cluster_regions"]) == n_good
    # default anytime behaviors: both whisker views via the SessionLoader
    assert set(behave) == {"left-whisker-motion-energy",
                           "right-whisker-motion-energy"}
    assert not behave["left-whisker-motion-energy"].get("skip")
    # trials mask from the real load_trials_and_mask
    mask = trials_data["trials_mask"]
    assert not mask[3] and not mask[7] and mask.sum() == len(mask) - 2
