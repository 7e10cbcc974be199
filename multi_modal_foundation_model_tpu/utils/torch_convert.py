"""Reference-checkpoint weight conversion (torch <-> flax).

The reference pickles the entire ``nn.Module`` (``model_best.pt`` holding
``{"model": <MultiModal instance>, "epoch": e}`` — reference
``src/trainer/base.py:302-308``; eval reload at
``src/utils/eval_utils.py:62``). The portable content of such a checkpoint
is its ``state_dict()``; this module maps that state_dict onto this
framework's flax param tree — and back — so that

- reference-trained weights can be cross-loaded for metric-parity runs, and
- weights trained here can be exported into the reference's parameter
  naming for independent verification.

Everything operates on **numpy arrays** (no torch import in the package):
callers convert ``{k: v.detach().cpu().numpy() for k, v in sd.items()}``.

Name mapping (reference module tree -> flax param tree; tensors are
transposed where torch ``nn.Linear`` stores ``(out, in)`` vs flax Dense
``(in, out)``):

====================================================  =========================================
reference state_dict key                              flax param path
====================================================  =========================================
encoder_embeddings.{m}.embedder.token_embed.weight    encoder_tokenizers_{m}/token_embed/kernel
encoder_embeddings.{m}.embedder.projection.*          encoder_tokenizers_{m}/projection/*
encoder_embeddings.{m}.embedder.mod_emb.weight        enc_mod_emb_{m}/embedding
encoder_embeddings.{m}.embedder.pos_embed.weight      enc_pos_emb_{m}/embedding
decoder_embeddings.{m}.embedder.(token path)          decoder_tokenizers_{m}/*
decoder_embeddings.{m}.embedder.mod_emb.weight        dec_mod_emb_{m}/embedding (unshared only)
decoder_embeddings.{m}.embedder.pos_embed.weight      dec_pos_emb_{m}/embedding
decoder_embeddings.{m}.out.*                          out_proj_{m}/*
encoder.{i}.(ln1|ln2).(weight|bias)                   encoder_{i}/(ln1|ln2)/(scale|bias)
encoder.{i}.attn.(query|key|value|out_proj).*         encoder_{i}/attn/.../(kernel|bias)
encoder.{i}.mlp.(up_proj|down_proj).*                 encoder_{i}/mlp/.../(kernel|bias)
encoder_norm.(weight|bias)                            encoder_norm/(scale|bias)
decoder_proj_context.*                                decoder_proj_context/*
decoder.{i}.(ln1|query_norm|context_norm|ln2).*       decoder_{i}/.../*
decoder.{i}.(attn|cross_attn).*                       decoder_{i}/.../*
decoder_norm.*                                        decoder_norm/(scale|bias)
====================================================  =========================================

When ``share_modality_embeddings`` (the reference default,
``mm.py:63-64,84-87``), the torch state_dict carries the shared table under
BOTH ``encoder_embeddings.{m}...mod_emb`` and
``decoder_embeddings.{m}...mod_emb``; the flax tree stores it once (module
reuse) under ``enc_mod_emb_{m}`` — conversion verifies the two copies are
identical and drops the decoder one.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

__all__ = [
    "reference_state_dict_to_params",
    "params_to_reference_state_dict",
]

# norm parameter rename (torch LayerNorm weight == flax LayerNorm scale)
_NORM_NAMES = ("ln1", "ln2", "query_norm", "context_norm")
_LINEAR_NAMES = ("query", "key", "value", "out_proj", "up_proj", "down_proj")


def _put(tree: Dict, path: Sequence[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _linear(tree, prefix, sd, key):
    """torch Linear (out,in) -> flax Dense kernel (in,out) + optional bias."""
    _put(tree, prefix + ("kernel",), sd[key + ".weight"].T)
    if key + ".bias" in sd:
        _put(tree, prefix + ("bias",), sd[key + ".bias"])


def _norm(tree, prefix, sd, key):
    if key + ".weight" in sd:                       # LayerNorm
        _put(tree, prefix + ("scale",), sd[key + ".weight"])
        _put(tree, prefix + ("bias",), sd[key + ".bias"])
    else:                                           # ScaleNorm scalar
        _put(tree, prefix + ("scale",), sd[key + ".scale"])


def reference_state_dict_to_params(
    sd: Dict[str, np.ndarray],
    avail_mod: Sequence[str] = ("ap", "behavior"),
    n_enc_layers: int = 5,
    n_dec_layers: int = 5,
    share_modality_embeddings: bool = True,
) -> Dict:
    """Map a reference ``MultiModal.state_dict()`` (as numpy) onto this
    framework's param tree (plain nested dict, ready for
    ``model.apply({"params": ...})``)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: Dict = {}

    for m in avail_mod:
        for side, tok, mod_emb, pos_emb in (
                ("encoder_embeddings", f"encoder_tokenizers_{m}",
                 f"enc_mod_emb_{m}", f"enc_pos_emb_{m}"),
                ("decoder_embeddings", f"decoder_tokenizers_{m}",
                 f"dec_mod_emb_{m}", f"dec_pos_emb_{m}")):
            emb = f"{side}.{m}.embedder"
            _linear(p, (tok, "token_embed"), sd, f"{emb}.token_embed")
            _linear(p, (tok, "projection"), sd, f"{emb}.projection")
            is_dec = side.startswith("decoder")
            if is_dec and share_modality_embeddings:
                enc_tbl = sd[f"encoder_embeddings.{m}.embedder.mod_emb.weight"]
                dec_tbl = sd[f"{emb}.mod_emb.weight"]
                if not np.array_equal(enc_tbl, dec_tbl):
                    raise ValueError(
                        f"share_modality_embeddings=True but encoder/decoder "
                        f"mod_emb for '{m}' differ in the state_dict")
            else:
                _put(p, (mod_emb, "embedding"), sd[f"{emb}.mod_emb.weight"])
            if f"{emb}.pos_embed.weight" in sd:
                _put(p, (pos_emb, "embedding"), sd[f"{emb}.pos_embed.weight"])
        _linear(p, (f"out_proj_{m}",), sd, f"decoder_embeddings.{m}.out")

    for i in range(n_enc_layers):
        base = f"encoder.{i}"
        for n in ("ln1", "ln2"):
            _norm(p, (f"encoder_{i}", n), sd, f"{base}.{n}")
        for n in ("query", "key", "value", "out_proj"):
            _linear(p, (f"encoder_{i}", "attn", n), sd, f"{base}.attn.{n}")
        for n in ("up_proj", "down_proj"):
            _linear(p, (f"encoder_{i}", "mlp", n), sd, f"{base}.mlp.{n}")
    _norm(p, ("encoder_norm",), sd, "encoder_norm")
    _linear(p, ("decoder_proj_context",), sd, "decoder_proj_context")

    for i in range(n_dec_layers):
        base = f"decoder.{i}"
        for n in _NORM_NAMES:
            _norm(p, (f"decoder_{i}", n), sd, f"{base}.{n}")
        for blk in ("attn", "cross_attn"):
            for n in ("query", "key", "value", "out_proj"):
                _linear(p, (f"decoder_{i}", blk, n), sd, f"{base}.{blk}.{n}")
        for n in ("up_proj", "down_proj"):
            _linear(p, (f"decoder_{i}", "mlp", n), sd, f"{base}.mlp.{n}")
    _norm(p, ("decoder_norm",), sd, "decoder_norm")

    return p


def _flat(tree: Dict, prefix=()) -> Dict[tuple, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def params_to_reference_state_dict(
    params: Dict,
    avail_mod: Sequence[str] = ("ap", "behavior"),
    share_modality_embeddings: bool = True,
) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax param tree -> reference state_dict names
    (numpy). Lets reference-side tooling verify weights trained here."""
    flat = _flat(params)
    sd: Dict[str, np.ndarray] = {}

    def emit_linear(ref_key, path):
        sd[ref_key + ".weight"] = flat[path + ("kernel",)].T
        if path + ("bias",) in flat:
            sd[ref_key + ".bias"] = flat[path + ("bias",)]

    def emit_norm(ref_key, path):
        scale = flat[path + ("scale",)]
        if scale.ndim == 0:                      # ScaleNorm
            sd[ref_key + ".scale"] = scale
        else:
            sd[ref_key + ".weight"] = scale
            sd[ref_key + ".bias"] = flat[path + ("bias",)]

    for m in avail_mod:
        for side, tok, mod_emb, pos_emb in (
                ("encoder_embeddings", f"encoder_tokenizers_{m}",
                 f"enc_mod_emb_{m}", f"enc_pos_emb_{m}"),
                ("decoder_embeddings", f"decoder_tokenizers_{m}",
                 f"dec_mod_emb_{m}", f"dec_pos_emb_{m}")):
            emb = f"{side}.{m}.embedder"
            emit_linear(f"{emb}.token_embed", (tok, "token_embed"))
            emit_linear(f"{emb}.projection", (tok, "projection"))
            src = (f"enc_mod_emb_{m}"
                   if share_modality_embeddings else mod_emb)
            sd[f"{emb}.mod_emb.weight"] = flat[(src, "embedding")]
            if (pos_emb, "embedding") in flat:
                sd[f"{emb}.pos_embed.weight"] = flat[(pos_emb, "embedding")]
        emit_linear(f"decoder_embeddings.{m}.out", (f"out_proj_{m}",))

    i = 0
    while (f"encoder_{i}",) + ("attn", "query", "kernel") in flat:
        for n in ("ln1", "ln2"):
            emit_norm(f"encoder.{i}.{n}", (f"encoder_{i}", n))
        for n in ("query", "key", "value", "out_proj"):
            emit_linear(f"encoder.{i}.attn.{n}", (f"encoder_{i}", "attn", n))
        for n in ("up_proj", "down_proj"):
            emit_linear(f"encoder.{i}.mlp.{n}", (f"encoder_{i}", "mlp", n))
        i += 1
    emit_norm("encoder_norm", ("encoder_norm",))
    emit_linear("decoder_proj_context", ("decoder_proj_context",))
    i = 0
    while (f"decoder_{i}",) + ("attn", "query", "kernel") in flat:
        for n in _NORM_NAMES:
            emit_norm(f"decoder.{i}.{n}", (f"decoder_{i}", n))
        for blk in ("attn", "cross_attn"):
            for n in ("query", "key", "value", "out_proj"):
                emit_linear(f"decoder.{i}.{blk}.{n}",
                            (f"decoder_{i}", blk, n))
        for n in ("up_proj", "down_proj"):
            emit_linear(f"decoder.{i}.mlp.{n}", (f"decoder_{i}", "mlp", n))
        i += 1
    emit_norm("decoder_norm", ("decoder_norm",))

    return sd
