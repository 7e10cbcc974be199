"""Tensor-parallel partitioning: param-path -> PartitionSpec rules.

TPU-idiomatic model parallelism (the "scaling book" recipe): pick a mesh,
annotate parameter shardings, and let XLA's SPMD partitioner propagate the
activation shardings and insert the collectives. No module rewrites — the
rules below impose the Megatron pattern on the existing flax param tree:

- attention q/k/v kernels column-sharded ``(None, 'model')`` (heads split
  across the model axis), ``out_proj`` row-sharded ``('model', None)`` —
  XLA turns the row-shard contraction into partial sums + one
  ``all-reduce`` per attention block;
- MLP ``up_proj`` column-sharded / ``down_proj`` row-sharded — same
  pattern, one all-reduce per MLP;
- tokenizer ``token_embed`` column-sharded over its intermediate width
  (the widest activations in the model: ``n_channels * mult`` for the
  single-session tokenizer, ``mult * hidden`` for the session-stitched
  one) and ``projection`` row-sharded;
- everything else (norms, embeddings, output heads) replicated.

The reference has no model parallelism of any kind (SURVEY.md §2.12 —
single GPU, HF accelerate never exercised); at the reference scale
(~10M params) TP is unnecessary, but the framework is built so scaling the
trunk is a sharding-spec change, not a rewrite. A dimension that does not
divide the 'model' axis falls back to replication for that axis (e.g. the
2-channel behavior tokenizer), so any model size runs on any mesh.

Note: the fused Pallas attention kernel is a custom call XLA's SPMD
partitioner cannot split by itself, so under a >1 'model' axis the
trainer wraps it in ``shard_map`` with heads sharded over the axis
(``ops/attention.py`` ``_flash_mha_tp`` / ``tp_attention`` — exact,
since softmax rows are head-local). ``attn_impl='pallas'`` therefore
composes with TP; ``attn_impl='xla'`` remains available as the oracle.
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Sequence, Tuple

import jax
import numpy as np

P = jax.sharding.PartitionSpec


def partition_rules() -> List[Tuple[str, P]]:
    """Ordered (regex, PartitionSpec) rules over '/'-joined param paths.

    First match wins. Specs apply to the trailing dims of the leaf: a spec
    shorter than the leaf rank is left-padded with None (so the same rule
    covers the session-stitched ``(S, in, out)`` kernels and their 2-D
    single-session counterparts).
    """
    col = P(None, "model")       # column parallel: shard output features
    row = P("model", None)       # row parallel: shard input features
    vec_out = P("model")         # bias of a column-parallel layer
    return [
        (r".*/(attn|cross_attn)/(query|key|value)/kernel", col),
        (r".*/(attn|cross_attn)/(query|key|value)/bias", vec_out),
        (r".*/(attn|cross_attn)/out_proj/kernel", row),
        (r".*/mlp/up_proj/kernel", col),
        (r".*/mlp/up_proj/bias", vec_out),
        (r".*/mlp/down_proj/kernel", row),
        # tokenizers: widest GEMMs in the model. token_embed is column
        # parallel (its intermediate width is sharded), projection is row
        # parallel. Covers both nn.Dense params (kernel/bias) and the
        # stitched (S, N, inter)/(S, inter) custom params.
        (r".*tokenizers_.*/token_embed(/kernel|_kernel)", col),
        (r".*tokenizers_.*/token_embed(/bias|_bias)", vec_out),
        (r".*tokenizers_.*/projection/kernel", row),
        (r".*", P()),
    ]


def _pad_spec(spec: P, rank: int) -> Optional[P]:
    """Left-pad ``spec`` with None to ``rank``; None if it cannot fit."""
    parts = tuple(spec)
    if len(parts) > rank:
        return None
    return P(*((None,) * (rank - len(parts)) + parts))


def _mesh_axis_sizes(mesh: jax.sharding.Mesh) -> dict:
    return dict(zip(mesh.axis_names, mesh.devices.shape))


def spec_for(path: str, shape: Sequence[int], mesh: jax.sharding.Mesh,
             rules: Optional[List[Tuple[str, P]]] = None) -> P:
    """Resolve the PartitionSpec for one leaf, degrading any axis whose
    dimension does not divide the mesh axis size to replicated."""
    sizes = _mesh_axis_sizes(mesh)
    for pattern, spec in rules or partition_rules():
        if re.fullmatch(pattern, path):
            padded = _pad_spec(spec, len(shape))
            if padded is None:
                return P()
            out = []
            for dim, axis in zip(shape, tuple(padded)):
                ok = axis is not None and sizes.get(axis, 1) > 1 \
                    and dim % sizes[axis] == 0
                out.append(axis if ok else None)
            while out and out[-1] is None:  # canonical: P() not P(None,...)
                out.pop()
            return P(*out)
    return P()


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def tree_shardings(tree: Any, mesh: jax.sharding.Mesh,
                   rules: Optional[List[Tuple[str, P]]] = None) -> Any:
    """NamedSharding pytree for ``tree`` (params, opt_state, or a whole
    TrainState — optimizer moments mirror the param paths, so the same
    regexes shard mu/nu consistently with their params)."""

    def leaf_sharding(path, leaf):
        shape = np.shape(leaf)
        spec = spec_for(_path_str(path), shape, mesh, rules)
        return jax.sharding.NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def shard_tree(tree: Any, mesh: Optional[jax.sharding.Mesh],
               rules: Optional[List[Tuple[str, P]]] = None) -> Any:
    """Place ``tree`` on the mesh under the partition rules. With no mesh
    this is the identity; with a DP-only mesh every rule resolves to
    replication (no 'model' axis), reproducing the round-1 behavior."""
    if mesh is None:
        return tree
    if "model" not in mesh.axis_names:
        return jax.device_put(
            tree, jax.sharding.NamedSharding(mesh, P()))
    return jax.device_put(tree, tree_shardings(tree, mesh, rules))


def model_axis_size(mesh: Optional[jax.sharding.Mesh]) -> int:
    if mesh is None or "model" not in mesh.axis_names:
        return 1
    return _mesh_axis_sizes(mesh)["model"]
