"""The MultiModal masked-autoencoder (flax linen), TPU-first.

Behavioral rebuild of the reference ``MultiModal``
(``/root/reference/src/multi_modal/mm.py:33-308``) with XLA-friendly
structure:

- **Static token layout.** Tokens are concatenated per modality in
  ``avail_mod`` order — each modality contributes exactly ``max_F`` tokens —
  so the modality id of every token position is a *compile-time* constant.
  The reference's dynamic boolean gather ``y[mod_mask == idx]``
  (``decoder_embeddings.py:105``) becomes a static slice, and the int16
  ``mod_mask`` tensors disappear entirely.
- **Batch-uniform masking as math, not indexing.** The reference zeroes the
  token positions selected by *batch element 0*'s mask for the whole batch
  (``mm.py:147-149,169-171``). Here that is ``tokens * (1 - mask[0])`` — an
  elementwise multiply XLA fuses into the embedding matmul.
- **Functional masker.** The masking mode arrives per call (static string,
  or a traced mode id via the trainer's ``lax.switch`` path) instead of the
  reference's mutable ``self.masker.mode`` (``mm.py:257``; SURVEY.md §2.4
  mutable-state hazard). In the masking-mode path the reference would read
  an undefined ``mask`` variable (``mm.py:256-272`` sets only
  ``spike_mask``); we derive the token-level input mask from the sampled
  element mask — the behavior that code path evidently intends.
- **Attention masks as additive biases** shared across heads, fed to the
  fused Pallas kernel (ops/attention.py). Encoder mask parity:
  ``eye OR (context AND pad)`` (``mm.py:152-158``); decoder parity:
  causal / modality-separation options (``mm.py:178-194``).
- **Loss parity**: Poisson NLL (log-input, no Stirling) on spikes + MSE on
  behavior, each masked, summed over modalities and normalized by the total
  masked-element count (``mm.py:217-239``).

Dtype policy: parameters live in f32; matmuls/activations run in
``compute_dtype`` (bf16 on TPU); losses and normalizations accumulate f32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import MaskSpec, create_context_mask
from ..ops.layernorm import FusedLayerNorm
from ..ops.losses import masked_mse, masked_poisson_nll
from ..ops.masking import MaskParams, RegionSets, apply_mask, apply_mask_by_id
from .layers import (DecoderLayer, EncoderLayer, ModalityTokenizer,
                     MXUDense, MXUEmbed, SessionStitchedHead,
                     SessionStitchedTokenizer)

MODALITY_LOSS = {"ap": "poisson_nll", "behavior": "mse"}


@flax.struct.dataclass
class ModalityInput:
    """Per-modality model input (the de-facto ``mod_dict`` contract,
    SURVEY.md Appendix B / reference ``trainer/base.py:57-101``)."""

    inputs: jnp.ndarray                    # (B, T, C)
    targets: jnp.ndarray                   # (B, T, C)
    attn_mask: jnp.ndarray                 # (B, T) int
    timestamps: jnp.ndarray                # (B, T) int
    eval_mask: Optional[jnp.ndarray] = None  # (B, T, C) int or None


@flax.struct.dataclass
class MultiModalOutput:
    loss: jnp.ndarray
    mod_loss: Dict[str, jnp.ndarray]
    mod_n_examples: Dict[str, jnp.ndarray]
    mod_preds: Dict[str, jnp.ndarray]
    mod_targets: Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class MultiModalConfig:
    """Static model hyperparameters (mirrors configs/multi_modal/mm.yaml)."""

    avail_mod: Tuple[str, ...] = ("ap", "behavior")
    n_channels: Dict[str, int] = dataclasses.field(
        default_factory=lambda: {"ap": 668, "behavior": 2})
    max_F: int = 100
    hidden_size: int = 256
    n_enc_layers: int = 5
    n_dec_layers: int = 5
    n_heads: int = 8
    inter_size: int = 512
    act: str = "gelu"
    use_scalenorm: bool = False
    attention_bias: bool = True
    mlp_bias: bool = True
    dropout: float = 0.4
    fixup_init: bool = True
    # embedder
    n_modality: int = 2
    mult: int = 2
    embed_act: str = "softsign"
    embed_scale: float = 1.0
    embed_bias: bool = True
    embed_dropout: float = 0.2
    use_pos: bool = True
    # decoder options
    decoder_sep_mask: bool = False
    decoder_causal_mask: bool = False
    context_forward: int = -1
    context_backward: int = -1
    # masker
    mask_params: MaskParams = dataclasses.field(default_factory=MaskParams)
    mask_mode: str = "temporal"
    force_active: bool = True
    # loss combination: None = reference parity (sum of modality loss sums /
    # total masked count, ``mm.py:237`` — lets the 668-channel Poisson term
    # swamp the 2-channel MSE term); a {mod: weight} dict switches to a
    # weighted sum of per-modality *means*, the balancing knob the
    # convergence study motivates (RESULTS.md)
    mod_loss_weights: Optional[Dict[str, float]] = None
    # compute
    attn_impl: str = "pallas"
    compute_dtype: Any = jnp.float32
    share_modality_embeddings: bool = True
    # rematerialize each transformer layer in backward: the 15 attention
    # ops' saved probabilities otherwise exceed HBM at production batch and
    # trigger XLA's pathological auto-remat with compressed activation
    # copies (measured: 91 ms vs 9 ms for the 5-layer decoder at B=256)
    remat_layers: bool = True
    # multi-session stitching (new work; >1 switches the 'ap' tokenizer and
    # head to session-indexed params and adds a session embedding)
    n_sessions: int = 1

    @classmethod
    def from_config(cls, cfg, n_channels: Dict[str, int],
                    avail_mod: Sequence[str] = ("ap", "behavior"),
                    **overrides) -> "MultiModalConfig":
        """Build from a loaded mm.yaml Config node."""
        enc_t = cfg.encoder.transformer
        dec_t = cfg.decoder.transformer
        emb = cfg.encoder.embedder
        compute = cfg.get("compute", {}) or {}
        dtype_map = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}
        kw = dict(
            avail_mod=tuple(avail_mod),
            n_channels=dict(n_channels),
            max_F=int(emb["max_F"]),
            hidden_size=int(enc_t["hidden_size"]),
            n_enc_layers=int(enc_t["n_layers"]),
            n_dec_layers=int(dec_t["n_layers"]),
            n_heads=int(enc_t["n_heads"]),
            inter_size=int(enc_t["inter_size"]),
            act=enc_t["act"],
            use_scalenorm=bool(enc_t["use_scalenorm"]),
            attention_bias=bool(enc_t["attention_bias"]),
            mlp_bias=bool(enc_t["mlp_bias"]),
            dropout=float(enc_t["dropout"]),
            fixup_init=bool(enc_t["fixup_init"]),
            n_modality=int(emb["n_modality"]),
            mult=int(emb["mult"]),
            embed_act=emb["act"],
            embed_scale=float(emb["scale"]) if emb["scale"] is not None
            else float(enc_t["hidden_size"]) ** 0.5,
            embed_bias=bool(emb["bias"]),
            embed_dropout=float(emb["dropout"]),
            use_pos=bool(emb["pos"]),
            decoder_sep_mask=bool(cfg.decoder["decoder_sep_mask"]),
            decoder_causal_mask=bool(cfg.decoder["decoder_causal_mask"]),
            context_forward=int(cfg.context["forward"]),
            context_backward=int(cfg.context["backward"]),
            mask_params=MaskParams.from_config(cfg.masker),
            mask_mode=cfg.masker["mode"],
            force_active=bool(cfg.masker["force_active"]),
            attn_impl=compute.get("attn_impl", "pallas"),
            compute_dtype=dtype_map.get(
                compute.get("compute_dtype", "float32"), jnp.float32),
        )
        # per-modality loss weights (framework extension over the
        # reference's count-summed normalization; RESULTS.md): reachable
        # from the CLI as --set model.mod_loss_weights.behavior=20
        lw = cfg.get("mod_loss_weights", None)
        if lw:
            kw["mod_loss_weights"] = {k: float(v) for k, v in dict(lw).items()}
        kw.update(overrides)
        return cls(**kw)

    # -- JSON round-trip (checkpoint sidecar; eval reload) -----------------

    def to_json_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["compute_dtype"] = jnp.dtype(self.compute_dtype).name
        return d

    @classmethod
    def from_json_dict(cls, d: Dict[str, Any]) -> "MultiModalConfig":
        d = dict(d)
        d["avail_mod"] = tuple(d["avail_mod"])
        dtype_map = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}
        d["compute_dtype"] = dtype_map[d.get("compute_dtype", "float32")]
        mp = d.get("mask_params", {})
        for k in ("channels", "timesteps"):
            if mp.get(k) is not None:
                mp[k] = tuple(mp[k])
        d["mask_params"] = MaskParams(**mp)
        return cls(**d)


class _TransformerCfg:
    """Adapter exposing the attribute names layers.py expects."""

    def __init__(self, mc: MultiModalConfig, n_layers: int):
        self.hidden_size = mc.hidden_size
        self.n_heads = mc.n_heads
        self.inter_size = mc.inter_size
        self.act = mc.act
        self.use_scalenorm = mc.use_scalenorm
        self.attention_bias = mc.attention_bias
        self.mlp_bias = mc.mlp_bias
        self.dropout = mc.dropout
        self.fixup_init = mc.fixup_init
        self.n_layers = n_layers


class MultiModal(nn.Module):
    """MultiMAE-style encoder-decoder over concatenated modality tokens."""

    config: MultiModalConfig

    def setup(self):
        mc = self.config
        self.mod_to_indx = {m: i for i, m in enumerate(mc.avail_mod)}

        self.stitched = mc.n_sessions > 1

        def tokenizer(mod):
            if self.stitched and mod == "ap":
                return SessionStitchedTokenizer(
                    n_sessions=mc.n_sessions, n_channels=mc.n_channels[mod],
                    hidden_size=mc.hidden_size, mult=mc.mult,
                    act=mc.embed_act, scale=mc.embed_scale,
                    use_bias=mc.embed_bias, dropout=mc.embed_dropout,
                    dtype=mc.compute_dtype)
            return ModalityTokenizer(
                n_channels=mc.n_channels[mod], hidden_size=mc.hidden_size,
                mult=mc.mult, act=mc.embed_act, scale=mc.embed_scale,
                use_bias=mc.embed_bias, dropout=mc.embed_dropout,
                dtype=mc.compute_dtype)

        self.encoder_tokenizers = {m: tokenizer(m) for m in mc.avail_mod}
        self.decoder_tokenizers = {m: tokenizer(m) for m in mc.avail_mod}
        if self.stitched:
            self.session_emb = MXUEmbed(
                mc.n_sessions, mc.hidden_size, name="session_emb",
                embedding_init=nn.initializers.normal(stddev=1.0))

        emb_init = nn.initializers.normal(stddev=1.0)  # torch Embedding default
        self.enc_mod_emb = {
            m: MXUEmbed(mc.n_modality, mc.hidden_size, name=f"enc_mod_emb_{m}",
                        embedding_init=emb_init)
            for m in mc.avail_mod}
        if mc.share_modality_embeddings:
            # module reuse == the reference's post-hoc aliasing (mm.py:84-87)
            self.dec_mod_emb = self.enc_mod_emb
        else:
            self.dec_mod_emb = {
                m: MXUEmbed(mc.n_modality, mc.hidden_size,
                            name=f"dec_mod_emb_{m}", embedding_init=emb_init)
                for m in mc.avail_mod}
        if mc.use_pos:
            self.enc_pos_emb = {
                m: MXUEmbed(mc.max_F, mc.hidden_size, name=f"enc_pos_emb_{m}",
                            embedding_init=emb_init)
                for m in mc.avail_mod}
            self.dec_pos_emb = {
                m: MXUEmbed(mc.max_F, mc.hidden_size, name=f"dec_pos_emb_{m}",
                            embedding_init=emb_init)
                for m in mc.avail_mod}

        enc_cfg = _TransformerCfg(mc, mc.n_enc_layers)
        dec_cfg = _TransformerCfg(mc, mc.n_dec_layers)
        if mc.remat_layers:
            # deterministic flag is static: EncoderLayer(x, mask, det),
            # DecoderLayer(x, ctx, sa, xa, det) — argnum counts self
            enc_layer_cls = nn.remat(EncoderLayer, static_argnums=(3,))
            dec_layer_cls = nn.remat(DecoderLayer, static_argnums=(5,))
        else:
            enc_layer_cls, dec_layer_cls = EncoderLayer, DecoderLayer
        self.encoder = [enc_layer_cls(enc_cfg, attn_impl=mc.attn_impl,
                                      dtype=mc.compute_dtype,
                                      name=f"encoder_{i}")
                        for i in range(mc.n_enc_layers)]
        self.encoder_norm = FusedLayerNorm(epsilon=1e-5,
                                           name="encoder_norm")
        self.decoder_proj_context = MXUDense(
            mc.hidden_size, name="decoder_proj_context",
            dtype=mc.compute_dtype)
        self.decoder = [dec_layer_cls(dec_cfg, attn_impl=mc.attn_impl,
                                      dtype=mc.compute_dtype,
                                      name=f"decoder_{i}")
                        for i in range(mc.n_dec_layers)]
        self.decoder_norm = FusedLayerNorm(epsilon=1e-5,
                                           name="decoder_norm")
        self.out_proj = {
            m: (SessionStitchedHead(n_sessions=mc.n_sessions,
                                    n_channels=mc.n_channels[m],
                                    hidden_size=mc.hidden_size,
                                    name=f"out_proj_{m}")
                if self.stitched and m == "ap" else
                MXUDense(mc.n_channels[m], name=f"out_proj_{m}"))
            for m in mc.avail_mod}

    # ------------------------------------------------------------------
    # mask plumbing
    # ------------------------------------------------------------------

    def _resolve_masks(self, mod: str, d: ModalityInput,
                       masking_mode, mtm_modes, regions, training: bool,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        """Returns (inputs (possibly corrupted), token_mask (B,T),
        spike_mask (B,T,C) or None) — the reference mm.py:256-275 block."""
        mc = self.config
        active = bool(mc.force_active) or training
        regions_arg = regions if mod == "ap" else None
        if (regions_arg is not None
                and regions_arg.region_ids.shape[-1] > d.inputs.shape[-1]):
            # width-bucketed batch: the region table is built at the global
            # N_max; the masker must see ids aligned with THIS bucket's
            # channel axis (ids past a session's real width are -1 padding
            # either way, so the static slice drops only padding columns)
            regions_arg = dataclasses.replace(
                regions_arg,
                region_ids=regions_arg.region_ids[..., :d.inputs.shape[-1]])

        if masking_mode is not None:
            key = self.make_rng("mask")
            if isinstance(masking_mode, str):
                corrupted, spike_mask = apply_mask(
                    key, d.inputs, mc.mask_params, masking_mode,
                    regions=regions_arg, active=active)
            else:  # traced mode id over the MtM scheme menu
                # modalities without region info (behavior) cannot run the
                # region-conditioned schemes; degrade those menu entries to
                # temporal masking (the reference would raise here —
                # masker.py:110,118 asserts on missing region info)
                menu = [m if (regions_arg is not None
                              or not m.endswith("region")) else "temporal"
                        for m in mtm_modes]
                corrupted, spike_mask = apply_mask_by_id(
                    key, d.inputs, mc.mask_params, masking_mode,
                    menu, regions=regions_arg)
            token_mask = (spike_mask[:, :, 0].astype(jnp.int32)
                          & d.attn_mask.astype(jnp.int32))
            return corrupted, token_mask, spike_mask

        if d.eval_mask is None:
            key = self.make_rng("mask")
            _, mask = apply_mask(key, d.inputs, mc.mask_params, mc.mask_mode,
                                 regions=regions_arg, active=active)
        else:
            mask = d.eval_mask
        token_mask = (mask[:, :, 0].astype(jnp.int32)
                      & d.attn_mask.astype(jnp.int32))
        return d.inputs, token_mask, None

    # ------------------------------------------------------------------
    # attention-mask construction
    # ------------------------------------------------------------------

    def _encoder_attn_mask(self, attn_tokens: jnp.ndarray) -> MaskSpec:
        """eye OR (context AND key-padding) (``mm.py:152-158``) — as a
        (key_pad, static) decomposition the fused kernel consumes without
        ever materializing a (B, N, N) tensor."""
        N = attn_tokens.shape[1]
        # context mask is all-ones in the reference live path (mm.py:155)
        return MaskSpec(key_pad=attn_tokens,
                        static=jnp.eye(N, dtype=jnp.int32))

    def _decoder_attn_mask(self, attn_tokens: jnp.ndarray) -> MaskSpec:
        """pad / causal / modality-separation terms (``mm.py:178-194``;
        OR-composition replicated as-is) as a (key_pad, static) pair."""
        mc = self.config
        N = attn_tokens.shape[1]
        T = mc.max_F
        static = None
        key_pad = attn_tokens
        if mc.decoder_causal_mask:
            static = create_context_mask(0, -1, N)
            key_pad = None                 # causal replaces the pad term
        if mc.decoder_sep_mask:
            mod_of_token = np.repeat(np.arange(len(mc.avail_mod)), T)
            sep = jnp.asarray(
                mod_of_token[:, None] != mod_of_token[None, :], jnp.int32)
            static = sep if static is None else (
                (static.astype(bool) | sep.astype(bool)).astype(jnp.int32))
        if mc.decoder_causal_mask and key_pad is None and static is not None:
            # causal-only: no pad term may re-admit padded keys
            key_pad = jnp.zeros_like(attn_tokens)
        return MaskSpec(key_pad=key_pad, static=static)

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------

    def __call__(
        self,
        mod_inputs: Dict[str, ModalityInput],
        masking_mode=None,                  # None | static str | traced id
        mtm_modes: Tuple[str, ...] = (),    # scheme menu for traced ids
        regions: Optional[RegionSets] = None,
        training: bool = False,
        session_id: Optional[jnp.ndarray] = None,   # traced, stitched only
        space_attn_mask: Optional[jnp.ndarray] = None,  # (B, N) 'ap' padding
    ) -> MultiModalOutput:
        mc = self.config
        deterministic = not training
        T = mc.max_F

        tokens_e, tokens_d, embs_e, embs_d = [], [], [], []
        token_masks, attn_tokens = [], []
        spike_masks: Dict[str, Optional[jnp.ndarray]] = {}
        gts: Dict[str, jnp.ndarray] = {}

        for mod in mc.avail_mod:
            d = mod_inputs[mod]
            inputs, token_mask, spike_mask = self._resolve_masks(
                mod, d, masking_mode, mtm_modes, regions, training)
            spike_masks[mod] = spike_mask
            gts[mod] = d.targets
            token_masks.append(token_mask)
            attn_tokens.append(d.attn_mask.astype(jnp.int32))

            x = inputs.astype(mc.compute_dtype)
            mod_id = jnp.full_like(d.timestamps, self.mod_to_indx[mod])
            e_emb = self.enc_mod_emb[mod](mod_id)
            d_emb = self.dec_mod_emb[mod](mod_id)
            if mc.use_pos:
                e_emb = e_emb + self.enc_pos_emb[mod](d.timestamps)
                d_emb = d_emb + self.dec_pos_emb[mod](d.timestamps)
            if self.stitched and mod == "ap":
                assert session_id is not None, \
                    "stitched model needs a session_id"
                # scalar id -> (1,1,H) broadcast; (B,) ids (session-mixed
                # batches) -> per-sample (B,1,H)
                s_emb = (self.session_emb(session_id)[:, None, :]
                         if session_id.ndim == 1
                         else self.session_emb(session_id)[None, None, :])
                e_emb = e_emb + s_emb
                d_emb = d_emb + s_emb
                tokens_e.append(self.encoder_tokenizers[mod](
                    x, session_id, deterministic))
                tokens_d.append(self.decoder_tokenizers[mod](
                    x, session_id, deterministic))
            else:
                tokens_e.append(self.encoder_tokenizers[mod](x, deterministic))
                # decoder tokens are embedded from the *inputs* too
                # (decoder_embeddings.py:46)
                tokens_d.append(self.decoder_tokenizers[mod](x, deterministic))
            embs_e.append(e_emb)
            embs_d.append(d_emb)

        enc_tokens = jnp.concatenate(tokens_e, axis=1)   # (B, M*T, H)
        dec_tokens = jnp.concatenate(tokens_d, axis=1)
        enc_emb = jnp.concatenate(embs_e, axis=1).astype(mc.compute_dtype)
        dec_emb = jnp.concatenate(embs_d, axis=1).astype(mc.compute_dtype)
        token_mask = jnp.concatenate(token_masks, axis=1)  # (B, M*T)
        attn_token = jnp.concatenate(attn_tokens, axis=1)

        # batch-uniform token zeroing by element 0's mask (mm.py:147-149)
        # — self-consistent because the reference (and this framework)
        # draws ONE mask per batch. Session-mixed batches break that
        # premise: the region-conditioned modes draw per sample there
        # (masking.py RegionTable.select with (B,) ids), so zeroing by
        # row 0 would cross-contaminate samples; that path zeroes each
        # sample by its own row (bit-identical whenever rows agree).
        per_sample = session_id is not None and session_id.ndim == 1
        zero_e = ((1 - token_mask) if per_sample
                  else (1 - token_mask[0])[None, :]
                  ).astype(enc_tokens.dtype)[:, :, None]
        enc_tokens = enc_tokens * zero_e
        dec_tokens = dec_tokens * zero_e  # decoder mask == encoder mask here

        enc_attn = self._encoder_attn_mask(attn_token)
        dec_attn = self._decoder_attn_mask(attn_token)

        # positional args: nn.remat static_argnums indexes positionally
        x = enc_tokens + enc_emb
        for layer in self.encoder:
            x = layer(x, enc_attn, deterministic)
        x = self.encoder_norm(x.astype(jnp.float32)).astype(mc.compute_dtype)

        context = self.decoder_proj_context(x) + enc_emb
        y = dec_tokens + dec_emb
        for layer in self.decoder:
            y = layer(y, context, dec_attn, enc_attn, deterministic)
        y = self.decoder_norm(y.astype(jnp.float32))

        # static per-modality slices replace the reference's boolean gather
        mod_loss, mod_n, mod_preds, mod_targets = {}, {}, {}, {}
        for i, mod in enumerate(mc.avail_mod):
            y_mod = y[:, i * T:(i + 1) * T, :]
            if self.stitched and mod == "ap":
                # head width follows the (possibly bucket-narrowed) input
                preds = self.out_proj[mod](
                    y_mod, session_id,
                    n_out=mod_inputs[mod].inputs.shape[-1])
            else:
                preds = self.out_proj[mod](y_mod)
            preds = preds.astype(jnp.float32)
            targets = gts[mod].astype(jnp.float32)
            if spike_masks[mod] is not None:
                elem_mask = spike_masks[mod]
            else:
                elem_mask = jnp.broadcast_to(
                    token_masks[i][:, :, None], targets.shape)
            if mod == "ap" and space_attn_mask is not None:
                # padded neurons (multi-session N_max padding) carry no loss
                elem_mask = elem_mask * space_attn_mask[:, None, :].astype(
                    elem_mask.dtype)
            if MODALITY_LOSS.get(mod, "mse") == "poisson_nll":
                loss_sum, n = masked_poisson_nll(preds, targets, elem_mask)
            else:
                loss_sum, n = masked_mse(preds, targets, elem_mask)
            mod_loss[mod] = loss_sum
            mod_n[mod] = n
            mod_preds[mod] = preds
            mod_targets[mod] = targets

        if mc.mod_loss_weights is not None:
            loss = sum(
                mc.mod_loss_weights.get(mod, 1.0)
                * mod_loss[mod] / jnp.maximum(mod_n[mod], 1.0)
                for mod in mc.avail_mod)
        else:
            total_n = sum(mod_n.values())
            loss = sum(mod_loss.values()) / jnp.maximum(total_n, 1.0)

        return MultiModalOutput(
            loss=loss, mod_loss=mod_loss, mod_n_examples=mod_n,
            mod_preds=mod_preds, mod_targets=mod_targets)
