"""Data layer tests: CSR codec, device decode, split prep, loaders, samplers."""

import numpy as np
import pytest

from multi_modal_foundation_model_tpu.data import (
    attention_mask,
    decode_spikes_on_device,
    dense_to_sparse_rows,
    flatten_csr_rows,
    get_length_grouped_indices,
    get_length_grouped_indices_stitched,
    make_loader,
    pad_seq_left_to_n,
    pad_seq_right_to_n,
    prepare_split,
    sparse_rows_to_dense,
    synthetic_session,
    synthetic_splits,
)


def test_csr_roundtrip(rng):
    spikes = rng.poisson(0.5, size=(4, 10, 7)).astype(np.float32)
    enc = dense_to_sparse_rows(spikes)
    dec = sparse_rows_to_dense(*enc)
    np.testing.assert_array_equal(dec, spikes)


def test_device_decode_matches_host(rng):
    spikes = rng.poisson(0.8, size=(3, 12, 9)).astype(np.float32)
    enc = dense_to_sparse_rows(spikes)
    flat = flatten_csr_rows(*enc, max_nnz=200)
    dense = np.asarray(decode_spikes_on_device(*flat, T=12, N=9))
    np.testing.assert_array_equal(dense, spikes)


def test_flatten_csr_nnz_guard(rng):
    spikes = np.ones((1, 4, 4), dtype=np.float32)
    enc = dense_to_sparse_rows(spikes)
    with pytest.raises(ValueError):
        flatten_csr_rows(*enc, max_nnz=3)


def test_pad_helpers():
    seq = np.arange(6, dtype=float).reshape(3, 2)
    right = pad_seq_right_to_n(seq, 5, pad_value=-1.0)
    assert right.shape == (5, 2)
    assert (right[3:] == -1).all()
    left = pad_seq_left_to_n(seq, 5, pad_value=0.0)
    assert (left[:2] == 0).all()
    np.testing.assert_array_equal(left[2:], seq)

    m = attention_mask(5, 2)
    np.testing.assert_array_equal(m, [1, 1, 1, 0, 0])
    np.testing.assert_array_equal(attention_mask(3, 0), [1, 1, 1])


def test_synthetic_session_coupling():
    sess = synthetic_session(seed=0, n_trials=50, n_neurons=32)
    assert sess.spikes.shape == (50, 100, 32)
    assert sess.behavior.shape == (50, 100, 2)
    assert sess.spikes.min() >= 0
    # behavior and population rate must be correlated (shared latents)
    pop = sess.spikes.sum(-1).ravel()
    beh = sess.behavior[..., 0].ravel()
    corr = np.corrcoef(pop, beh)[0, 1]
    assert abs(corr) > 0.05


def test_prepare_split_shapes_and_masks():
    sess = synthetic_session(seed=1, n_trials=10, n_timesteps=50, n_neurons=20)
    arrays = prepare_split(sess, max_time_length=60, max_space_length=32)
    assert arrays["spikes_data"].shape == (10, 60, 32)
    assert arrays["target"].shape == (10, 60, 2)
    np.testing.assert_array_equal(arrays["time_attn_mask"][0, :50], 1)
    np.testing.assert_array_equal(arrays["time_attn_mask"][0, 50:], 0)
    np.testing.assert_array_equal(arrays["space_attn_mask"][0, :20], 1)
    np.testing.assert_array_equal(arrays["space_attn_mask"][0, 20:], 0)
    # padded neurons get region id -1
    assert (arrays["region_ids"][20:] == -1).all()
    assert (arrays["region_ids"][:20] >= 0).all()


def test_prepare_split_sort_by_depth():
    sess = synthetic_session(seed=2, n_trials=4, n_neurons=16)
    # scramble depths
    sess.neuron_depths[:] = np.random.default_rng(0).permutation(16).astype(np.float32)
    arrays = prepare_split(sess, max_time_length=100, max_space_length=16,
                           sort_by_depth=True)
    assert (np.diff(arrays["neuron_depths"]) >= 0).all()


def test_prepare_split_truncation():
    sess = synthetic_session(seed=3, n_trials=4, n_timesteps=120, n_neurons=40)
    arrays = prepare_split(sess, max_time_length=100, max_space_length=30)
    assert arrays["spikes_data"].shape == (4, 100, 30)
    np.testing.assert_array_equal(arrays["time_attn_mask"], 1)


def test_loader_batches_fixed_shape():
    sess = synthetic_session(seed=4, n_trials=21, n_neurons=12)
    loader = make_loader(sess, batch_size=8, max_time_length=100,
                         max_space_length=12, shuffle=True, seed=7)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["spikes_data"].shape == (8, 100, 12)
    # last batch: 5 real, padding trials have zero attention
    last = batches[-1]
    assert last["n_real"] == 5
    assert (last["time_attn_mask"][5:] == 0).all()
    assert (last["time_attn_mask"][0] == 1).all()


def test_loader_deterministic_given_seed_epoch():
    sess = synthetic_session(seed=5, n_trials=32, n_neurons=8)
    l1 = make_loader(sess, batch_size=8, max_space_length=8, seed=3)
    l2 = make_loader(sess, batch_size=8, max_space_length=8, seed=3)
    b1 = [b["spikes_data"] for b in l1]
    b2 = [b["spikes_data"] for b in l2]
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)
    # next epoch differs
    b3 = [b["spikes_data"] for b in l1]
    assert any(not np.array_equal(x, y) for x, y in zip(b1, b3))


def test_length_grouped_indices_cover_all():
    lengths = list(np.random.default_rng(0).integers(5, 50, size=37))
    idx = get_length_grouped_indices(lengths, batch_size=4,
                                     generator=np.random.default_rng(1))
    assert sorted(idx) == list(range(37))


def test_stitch_grouped_indices_group_same_lengths():
    lengths = [10] * 8 + [20] * 8
    idx = get_length_grouped_indices_stitched(
        lengths, batch_size=4, generator=np.random.default_rng(0))
    assert sorted(idx) == list(range(16))
    # every batch of 4 must be single-length
    for i in range(0, 16, 4):
        batch_lengths = {lengths[j] for j in idx[i:i + 4]}
        assert len(batch_lengths) == 1


def test_synthetic_splits():
    splits = synthetic_splits(seed=0, n_trials=40, n_neurons=16)
    assert splits.train.n_trials == 32
    assert splits.val.n_trials == 4
    assert splits.test.n_trials == 4
    assert splits.n_neurons == 16


def test_target_selection():
    sess = synthetic_session(seed=6, n_trials=4, n_neurons=8)
    loader = make_loader(sess, batch_size=4, max_space_length=8,
                         target=["whisker-motion-energy"])
    batch = next(iter(loader))
    assert batch["target"].shape[-1] == 1
    np.testing.assert_array_equal(batch["target"][..., 0].shape, (4, 100))


def test_prepare_split_unit_filter():
    """NEMO-style unit filtering: boolean or index selection before padding
    (reference loader/base.py:331-343)."""
    from multi_modal_foundation_model_tpu.data.loader import prepare_split
    from multi_modal_foundation_model_tpu.data.session import synthetic_session

    sess = synthetic_session(seed=0, n_trials=10, n_neurons=16, n_timesteps=8)
    keep = np.zeros(16, dtype=bool)
    keep[[1, 3, 5]] = True
    arrays = prepare_split(sess, max_time_length=8, max_space_length=8,
                           unit_filter=keep)
    assert arrays["space_attn_mask"][0].sum() == 3
    np.testing.assert_array_equal(
        arrays["spikes_data"][:, :, :3], sess.spikes[:, :, [1, 3, 5]])
    # index form
    arrays2 = prepare_split(sess, max_time_length=8, max_space_length=8,
                            unit_filter=np.array([1, 3, 5]))
    np.testing.assert_array_equal(arrays["spikes_data"],
                                  arrays2["spikes_data"])


def test_load_nemo_units_and_make_loader(tmp_path):
    """NEMO pkl unit-filter path end-to-end (reference loader/base.py:331-343
    + make_loader use_nemo flag): only units whose uuid appears in the
    embedding pickle survive, space axis narrows to the kept count, and the
    batch carries the aligned nemo_rep rows."""
    import dataclasses
    import pickle

    from multi_modal_foundation_model_tpu.data.loader import (load_nemo_units,
                                                              make_loader)
    from multi_modal_foundation_model_tpu.data.session import synthetic_session

    N = 12
    sess = synthetic_session(seed=3, n_trials=10, n_neurons=N, n_timesteps=8)
    uuids = np.array([f"uuid-{i:03d}" for i in range(N)])
    sess = dataclasses.replace(sess, cluster_uuids=uuids)

    # NEMO table covers units 2,5,7,9 (+ one uuid not in the session)
    nemo_uuids = np.array(["uuid-002", "uuid-005", "uuid-007", "uuid-009",
                           "uuid-999"])
    rng = np.random.default_rng(0)
    pkl = {"uuids": nemo_uuids,
           "wvf_rep": rng.normal(size=(5, 4)).astype(np.float32),
           "acg_rep": rng.normal(size=(5, 3)).astype(np.float32)}
    path = tmp_path / "MtM_unit_embed.pkl"
    with open(path, "wb") as f:
        pickle.dump(pkl, f)

    unit_ids, nemo_rep = load_nemo_units(str(path), uuids)
    np.testing.assert_array_equal(unit_ids, [2, 5, 7, 9])
    assert nemo_rep.shape == (4, 7)
    np.testing.assert_allclose(
        nemo_rep,
        np.concatenate([pkl["wvf_rep"], pkl["acg_rep"]], axis=1)[:4])

    loader = make_loader(sess, batch_size=4, max_time_length=8,
                         max_space_length=N, use_nemo=True,
                         nemo_path=str(path), shuffle=False)
    batch = next(iter(loader))
    assert batch["spikes_data"].shape[-1] == 4  # narrowed to kept units
    np.testing.assert_array_equal(
        batch["spikes_data"][0], sess.spikes[0][:, [2, 5, 7, 9]])
    assert batch["nemo_rep"].shape == (4, 7)


def test_make_loader_length_grouped_sampler():
    """sampler="length_grouped" reaches the HF-style megabatch grouping
    from make_loader (reference imports LengthGroupedSampler in
    make_loader.py:2; exposed here explicitly)."""
    from multi_modal_foundation_model_tpu.data.loader import make_loader
    from multi_modal_foundation_model_tpu.data.session import synthetic_session

    sess = synthetic_session(seed=1, n_trials=24, n_neurons=8, n_timesteps=8)
    loader = make_loader(sess, batch_size=4, max_time_length=8,
                         max_space_length=8, sampler="length_grouped")
    assert loader.sampler == "length_grouped"
    seen = np.concatenate([b["spikes_data"] for b in loader])
    assert seen.shape[0] == 24  # every trial appears exactly once


# ---------------------------------------------------------------------------
# load_ibl_dataset split machinery (offline, dependency-injected)
# parity: /root/reference/src/utils/dataset_utils.py:160-320
# ---------------------------------------------------------------------------

def _fake_hub(n_sessions=4, n_trials=37, seed0=100):
    """(load_session, list_datasets) pair over synthetic sessions."""
    from multi_modal_foundation_model_tpu.data.session import synthetic_splits

    eids = [f"eid{i:02d}" for i in range(n_sessions)]

    def load_session(e):
        i = eids.index(e)
        return synthetic_splits(seed=seed0 + i, n_trials=n_trials,
                                n_neurons=16 + 8 * i, n_timesteps=10)

    def list_datasets(org):
        ids = [f"{org}/{e}_aligned" for e in eids]
        ids.append(f"{org}/{eids[0]}_unaligned")  # filtered by train_aligned
        return ids

    return eids, load_session, list_datasets


def test_load_ibl_dataset_predefined_truncates_to_batch_multiples():
    from multi_modal_foundation_model_tpu.data.session import load_ibl_dataset

    eids, load_session, list_datasets = _fake_hub(n_sessions=3)
    train, val, test, meta = load_ibl_dataset(
        None, num_sessions=2, split_method="predefined", batch_size=8,
        _load_session=load_session, _list_datasets=list_datasets)
    # hub discovery: first 2 aligned sessions, unaligned id filtered out
    assert meta["eids"] == eids[:2]
    assert meta["num_sessions"] == 2
    assert meta["num_neurons"] == [16, 24]
    for e in eids[:2]:
        # 37 trials -> 80/10/10 synthetic split = 29/3/5 -> floor to x8
        assert train[e].train.n_trials % 8 == 0
        assert train[e].val.n_trials % 8 == 0
        assert train[e].test.n_trials % 8 == 0
        raw = load_session(e)
        assert train[e].train.n_trials == raw.train.n_trials - raw.train.n_trials % 8


def test_load_ibl_dataset_random_split_partitions_trials():
    from multi_modal_foundation_model_tpu.data.session import load_ibl_dataset

    eids, load_session, list_datasets = _fake_hub(n_sessions=2, n_trials=40)
    train, val, test, meta = load_ibl_dataset(
        None, num_sessions=2, split_method="random_split", split_size=0.2,
        seed=7, _load_session=load_session, _list_datasets=list_datasets)
    for e in meta["eids"]:
        sp = train[e]
        total = sp.train.n_trials + sp.val.n_trials + sp.test.n_trials
        assert total == 40  # all trials of the session, re-partitioned
        assert sp.test.n_trials == 8  # 0.2 * 40
        # deterministic in seed
        train2, *_ = load_ibl_dataset(
            None, num_sessions=2, split_method="random_split",
            split_size=0.2, seed=7, _load_session=load_session,
            _list_datasets=list_datasets)
        np.testing.assert_array_equal(sp.test.spikes, train2[e].test.spikes)


def test_load_ibl_dataset_session_based_and_eval_mode():
    from multi_modal_foundation_model_tpu.data.session import load_ibl_dataset

    eids, load_session, list_datasets = _fake_hub(n_sessions=4)
    train, val, test, meta = load_ibl_dataset(
        None, num_sessions=4, split_method="session_based",
        test_session_eid=[eids[3]],
        _load_session=load_session, _list_datasets=list_datasets)
    assert eids[3] not in train and eids[3] in test
    assert set(train) == set(eids[:3])

    # eval mode: only the test sessions load
    train, val, test, meta = load_ibl_dataset(
        None, mode="eval", test_session_eid=[eids[1]],
        split_method="session_based",
        _load_session=load_session, _list_datasets=list_datasets)
    assert train is None and val is None
    assert set(test) == {eids[1]}

    # random_split + test sessions is rejected (reference assert)
    import pytest
    with pytest.raises(AssertionError):
        load_ibl_dataset(None, split_method="random_split",
                         test_session_eid=[eids[0]],
                         _load_session=load_session,
                         _list_datasets=list_datasets)


def test_load_ibl_dataset_use_re_filter(tmp_path):
    from multi_modal_foundation_model_tpu.data.session import load_ibl_dataset

    eids, load_session, list_datasets = _fake_hub(n_sessions=4)
    allow = tmp_path / "target_eids.txt"
    deny = tmp_path / "test_re_eids.txt"
    allow.write_text("\n".join(eids[:3]) + "\n")
    deny.write_text(eids[1] + "\n")
    train, val, test, meta = load_ibl_dataset(
        None, num_sessions=4, split_method="predefined", use_re=True,
        target_eids_path=str(allow), test_re_eids_path=str(deny),
        _load_session=load_session, _list_datasets=list_datasets)
    assert meta["eids"] == [eids[0], eids[2]]  # allow minus deny


def test_load_ibl_dataset_skips_failing_sessions():
    from multi_modal_foundation_model_tpu.data.session import load_ibl_dataset

    eids, load_session, list_datasets = _fake_hub(n_sessions=3)

    def flaky(e):
        if e == eids[1]:
            raise IOError("hub down")
        return load_session(e)

    train, val, test, meta = load_ibl_dataset(
        None, num_sessions=3, split_method="predefined",
        _load_session=flaky, _list_datasets=list_datasets)
    assert meta["eids"] == [eids[0], eids[2]]


def test_load_ibl_dataset_zero_train_sessions_is_not_all():
    """num_sessions counts train AND test sessions: when they are all
    test sessions, ZERO train sessions load (the falsy-0 slice bug made
    this load every hub session; reference dataset_utils.py:212)."""
    from multi_modal_foundation_model_tpu.data.session import load_ibl_dataset

    eids, load_session, list_datasets = _fake_hub(n_sessions=3)
    train, val, test, meta = load_ibl_dataset(
        None, num_sessions=1, split_method="session_based",
        test_session_eid=[eids[2]],
        _load_session=load_session, _list_datasets=list_datasets)
    assert train is None and val is None
    assert set(test) == {eids[2]}

    import pytest
    with pytest.raises(AssertionError):  # negative budget is a caller error
        load_ibl_dataset(None, num_sessions=1,
                         split_method="session_based",
                         test_session_eid=[eids[1], eids[2]],
                         _load_session=load_session,
                         _list_datasets=list_datasets)


def test_load_ibl_dataset_unaligned_discovery():
    """train_aligned=False selects exactly the <eid>_unaligned hub
    datasets; 'aligned' being a substring of 'unaligned' must not leak
    unaligned names into the aligned list or vice versa (the reference's
    substring filter can never select unaligned data — known defect)."""
    from multi_modal_foundation_model_tpu.data.session import load_ibl_dataset

    eids, load_session, list_datasets = _fake_hub(n_sessions=3)
    # only eid00 has an unaligned dataset in the fake hub
    train, val, test, meta = load_ibl_dataset(
        None, num_sessions=3, split_method="predefined", batch_size=4,
        train_aligned=False,
        _load_session=load_session, _list_datasets=list_datasets)
    assert meta["eids"] == [eids[0]]

    # and the aligned list holds exactly the three _aligned names
    _, _, _, meta_a = load_ibl_dataset(
        None, num_sessions=3, split_method="predefined", batch_size=4,
        _load_session=load_session, _list_datasets=list_datasets)
    assert meta_a["eids"] == eids[:3]


def test_load_ibl_dataset_session_based_meta_includes_test_sessions():
    """Stitched tokenizer/head sizing and per-eid eval need meta entries
    for the held-out sessions returned in ``test``."""
    from multi_modal_foundation_model_tpu.data.session import load_ibl_dataset

    eids, load_session, list_datasets = _fake_hub(n_sessions=4)
    train, val, test, meta = load_ibl_dataset(
        None, num_sessions=4, split_method="session_based",
        test_session_eid=[eids[3]],
        _load_session=load_session, _list_datasets=list_datasets)
    assert eids[3] in meta["eids"]
    assert meta["eid_list"][eids[3]] == test[eids[3]].n_neurons
    assert meta["num_sessions"] == 4
