"""CSR spike codec: HF-storable sparse lists <-> dense binned spikes.

The on-hub storage format is the reference's: per trial, a CSR triplet
(data/indices/indptr) plus shape, each stored as python lists
(``/root/reference/src/utils/dataset_utils.py:28-43``). This module provides

- the host-side numpy codec (bit-compatible with the reference), and
- a device-side decode path: CSR rows flattened to fixed-size arrays on the
  host, scatter-added into dense ``(K, T, N)`` on device inside jit. This is
  the TPU-native "loader" tier — the decode rides XLA scatter instead of a
  python loop over ``scipy.sparse`` matrices.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

try:  # scipy is available in the image; keep a guard for minimal installs
    from scipy.sparse import csr_array

    _HAVE_SCIPY = True
except Exception:  # pragma: no cover
    _HAVE_SCIPY = False


def dense_to_sparse_rows(binned_spikes: np.ndarray):
    """Encode dense (K, T, N) spikes as per-trial CSR lists.

    Returns ``(data_list, indices_list, indptr_list, shape_list)`` matching
    the reference ``get_sparse_from_binned_spikes`` storage columns.
    """
    data_list, indices_list, indptr_list, shape_list = [], [], [], []
    for k in range(binned_spikes.shape[0]):
        trial = np.asarray(binned_spikes[k])
        if _HAVE_SCIPY:
            m = csr_array(trial, dtype=np.ubyte)
            data, indices, indptr = m.data, m.indices, m.indptr
        else:  # manual CSR encode
            data, indices, indptr = [], [], [0]
            for row in trial:
                nz = np.nonzero(row)[0]
                indices.extend(nz.tolist())
                data.extend(row[nz].astype(np.ubyte).tolist())
                indptr.append(len(indices))
            data, indices, indptr = (np.asarray(data, np.ubyte),
                                     np.asarray(indices, np.int64),
                                     np.asarray(indptr, np.int64))
        data_list.append(np.asarray(data).tolist())
        indices_list.append(np.asarray(indices).tolist())
        indptr_list.append(np.asarray(indptr).tolist())
        shape_list.append(tuple(trial.shape))
    return data_list, indices_list, indptr_list, shape_list


def sparse_rows_to_dense(data_list: Sequence, indices_list: Sequence,
                         indptr_list: Sequence, shape_list: Sequence) -> np.ndarray:
    """Decode per-trial CSR lists to dense (K, T, N) float array (host path).

    Bit-compatible with the reference ``get_binned_spikes_from_sparse``
    (``dataset_utils.py:38-43``).
    """
    out = []
    for data, indices, indptr, shape in zip(data_list, indices_list,
                                            indptr_list, shape_list):
        T, N = int(shape[0]), int(shape[1])
        dense = np.zeros((T, N), dtype=np.float64)
        data = np.asarray(data)
        indices = np.asarray(indices, dtype=np.int64)
        indptr = np.asarray(indptr, dtype=np.int64)
        for t in range(T):
            lo, hi = indptr[t], indptr[t + 1]
            dense[t, indices[lo:hi]] = data[lo:hi]
        out.append(dense)
    return np.stack(out, axis=0)


def flatten_csr_rows(data_list: Sequence, indices_list: Sequence,
                     indptr_list: Sequence, shape_list: Sequence,
                     max_nnz: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Flatten per-trial CSR to fixed-shape COO arrays for device decode.

    Returns ``(values, time_ids, chan_ids, valid)`` each of shape
    ``(K, max_nnz)``; entries beyond a trial's nnz are zero/invalid. The
    fixed ``max_nnz`` keeps shapes static for XLA.
    """
    K = len(data_list)
    values = np.zeros((K, max_nnz), dtype=np.float32)
    time_ids = np.zeros((K, max_nnz), dtype=np.int32)
    chan_ids = np.zeros((K, max_nnz), dtype=np.int32)
    valid = np.zeros((K, max_nnz), dtype=np.bool_)
    for k, (data, indices, indptr, shape) in enumerate(
            zip(data_list, indices_list, indptr_list, shape_list)):
        data = np.asarray(data, dtype=np.float32)
        indices = np.asarray(indices, dtype=np.int32)
        indptr = np.asarray(indptr, dtype=np.int64)
        nnz = int(data.shape[0])
        if nnz > max_nnz:
            raise ValueError(f"trial {k}: nnz={nnz} exceeds max_nnz={max_nnz}")
        # row (time-bin) id per nonzero from indptr run lengths
        rows = np.repeat(np.arange(len(indptr) - 1, dtype=np.int32),
                         np.diff(indptr))
        values[k, :nnz] = data
        time_ids[k, :nnz] = rows
        chan_ids[k, :nnz] = indices
        valid[k, :nnz] = True
    return values, time_ids, chan_ids, valid


def decode_spikes_on_device(values, time_ids, chan_ids, valid,
                            T: int, N: int):
    """Scatter flattened CSR nonzeros into dense (K, T, N) spikes on device.

    jit-compatible: static output shape, one fused XLA scatter-add per batch.
    Invalid (padding) entries scatter zeros.
    """
    import jax.numpy as jnp

    values = jnp.where(valid, values, 0.0)
    flat_idx = (time_ids.astype(jnp.int32) * N + chan_ids.astype(jnp.int32))
    # clamp padding indices into range; their contribution is zero anyway
    flat_idx = jnp.clip(flat_idx, 0, T * N - 1)

    def scatter_one(vals, idx):
        return jnp.zeros((T * N,), dtype=vals.dtype).at[idx].add(vals)

    import jax

    dense = jax.vmap(scatter_one)(values, flat_idx)
    return dense.reshape((-1, T, N))
