"""Side-by-side training study: reference torch model vs this framework.

Resolves the round-1 parity-normalization question (VERDICT.md Weak #2):
under the reference's exact loss normalization (sum of modality loss sums /
total masked count, ``/root/reference/src/multi_modal/mm.py:237``), decode
R² on synthetic data stayed near zero in this framework while the reference
reports 0.64/0.70 on real data. Is that a fidelity bug here, or a property
of the loss/data regime the reference itself shares?

Protocol (everything deterministic and IDENTICAL on both sides):
- one synthetic session (data/session.py generator);
- the reference ``MultiModal`` built from ``/root/reference/src`` with
  dropout 0, and this framework's flax model initialized from the SAME
  weights via ``utils.torch_convert``;
- same batch order, same objective cycle (encoding / decoding /
  token-masking with host-sampled temporal masks fed to BOTH models as
  explicit eval masks), AdamW(lr, wd) at constant LR on both sides;
- per-step losses recorded for both; after training, decode R² (trial) is
  computed for both with the same numpy metrics.

If the loss curves track and the two decode-R² values agree, the round-1
collapse is a property of the objective/data regime — shared by the
reference — and not a rebuild infidelity.

Run (offline):  MMFM_PLATFORM=cpu python scripts/parity_study.py \
    --steps 300 --n-neurons 128 --epochs-eval 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from _common import *  # noqa: F401,F403 — path + platform setup
import jax
import jax.numpy as jnp

REF_SRC = "/root/reference/src"

AVAIL_MOD = ("ap", "behavior")


# ---------------------------------------------------------------------------
# reference side
# ---------------------------------------------------------------------------

def build_reference(n_neurons, n_behaviors, max_F, dropout, seed):
    sys.path.insert(0, REF_SRC)
    from multi_modal.decoder_embeddings import DecoderEmbedding
    from multi_modal.encoder_embeddings import EncoderEmbedding
    from multi_modal.mm import MultiModal as RefMultiModal
    from utils.config_utils import update_config
    import torch

    torch.manual_seed(seed)
    over = {
        "encoder": {"embedder": {"max_F": max_F, "dropout": dropout},
                    "transformer": {"dropout": dropout}},
        "decoder": {"embedder": {"max_F": max_F, "dropout": dropout},
                    "transformer": {"dropout": dropout}},
    }
    config = update_config(
        os.path.join(REF_SRC, "configs/multi_modal/mm.yaml"), over)
    enc, dec = {}, {}
    for mod in AVAIL_MOD:
        n_ch = n_neurons if mod == "ap" else n_behaviors
        enc[mod] = EncoderEmbedding(hidden_size=256, n_channel=n_ch,
                                    config=config.encoder)
        dec[mod] = DecoderEmbedding(hidden_size=256, n_channel=n_ch,
                                    output_channel=n_ch,
                                    config=config.decoder)
    model = RefMultiModal(enc, dec, avail_mod=list(AVAIL_MOD), config=config,
                          share_modality_embeddings=True)
    return model, config


def ref_mod_dict(torch, spikes, behavior, attn, ts, eval_masks):
    md = {}
    arrays = {"ap": spikes, "behavior": behavior}
    for i, mod in enumerate(AVAIL_MOD):
        x = torch.tensor(arrays[mod])
        md[mod] = {
            "inputs_modality": torch.tensor(i),
            "targets_modality": torch.tensor(i),
            "inputs_attn_mask": torch.tensor(attn, dtype=torch.int64),
            "inputs_timestamp": torch.tensor(ts, dtype=torch.int64),
            "targets_timestamp": torch.tensor(ts, dtype=torch.int64),
            "eid": "parity-study",
            "num_neuron": spikes.shape[2],
            "masking_mode": None,
            "inputs": x.clone(),
            "targets": x.clone(),
            "eval_mask": torch.tensor(eval_masks[mod], dtype=torch.int64),
        }
        if mod == "ap":
            md[mod]["inputs_regions"] = np.full(
                (spikes.shape[2], spikes.shape[0]), "CA1")
    return md


# ---------------------------------------------------------------------------
# objective masks (host-sampled, shared by both sides)
# ---------------------------------------------------------------------------

def step_masks(objective, mask_rng, B, T, N, n_beh, ratio):
    ones_sp = np.ones((B, T, N), "int64")
    zero_sp = np.zeros((B, T, N), "int64")
    ones_be = np.ones((B, T, n_beh), "int64")
    zero_be = np.zeros((B, T, n_beh), "int64")
    if objective == "encoding":
        return {"ap": ones_sp, "behavior": zero_be}
    if objective == "decoding":
        return {"ap": zero_sp, "behavior": ones_be}
    # token_masking: per-modality temporal draw (the masker's temporal mode
    # semantics — masker.py:79-93 — sampled host-side so both frameworks
    # receive the identical mask)
    m_sp, m_be = zero_sp.copy(), zero_be.copy()
    m_sp[:, mask_rng.random(T) < ratio, :] = 1
    m_be[:, mask_rng.random(T) < ratio, :] = 1
    return {"ap": m_sp, "behavior": m_be}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300,
                    help="lockstep steps with per-step loss comparison")
    ap.add_argument("--epochs-eval", type=int, default=0,
                    help="extra decode-R2 epochs AFTER the lockstep phase "
                         "(both sides keep training, losses not compared)")
    ap.add_argument("--n-neurons", type=int, default=128)
    ap.add_argument("--n-trials", type=int, default=256)
    ap.add_argument("--max-F", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--wd", type=float, default=0.01)
    ap.add_argument("--mask-ratio", type=float, default=0.3)
    ap.add_argument("--objectives", choices=["mixed", "decoding"],
                    default="mixed",
                    help="mixed = encoding/decoding/token-masking cycle "
                         "(the anomaly regime); decoding = decode-only")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", type=str, default="results/parity_study.json")
    args = ap.parse_args()

    import torch

    from multi_modal_foundation_model_tpu.data.session import synthetic_splits
    from multi_modal_foundation_model_tpu.eval.metrics import compute_R2_main
    from multi_modal_foundation_model_tpu.models.multimodal import (
        ModalityInput, MultiModal, MultiModalConfig)
    from multi_modal_foundation_model_tpu.ops.masking import MaskParams
    from multi_modal_foundation_model_tpu.utils.torch_convert import \
        reference_state_dict_to_params

    N, n_beh, T, B = args.n_neurons, 2, args.max_F, args.batch_size
    splits = synthetic_splits(seed=args.seed, n_trials=args.n_trials,
                              n_neurons=N, n_timesteps=T)
    train, test = splits.train, splits.test
    n_train = (train.spikes.shape[0] // B) * B

    # --- reference side -------------------------------------------------
    ref_model, _ = build_reference(N, n_beh, T, dropout=0.0, seed=args.seed)
    ref_model.train()
    ref_opt = torch.optim.AdamW(ref_model.parameters(), lr=args.lr,
                                weight_decay=args.wd, eps=1e-8)

    # --- flax side: SAME weights ---------------------------------------
    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_model.state_dict().items()}
    params = reference_state_dict_to_params(sd)
    cfg = MultiModalConfig(
        n_channels={"ap": N, "behavior": n_beh}, max_F=T,
        dropout=0.0, embed_dropout=0.0, attn_impl="xla",
        compute_dtype=jnp.float32, mask_params=MaskParams(ratio=args.mask_ratio),
        remat_layers=False)
    model = MultiModal(cfg)

    import optax
    tx = optax.adamw(args.lr, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=args.wd)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, spikes, behavior, attn, ts,
                   mask_sp, mask_be):
        def loss_fn(p):
            mi = {
                "ap": ModalityInput(spikes, spikes, attn, ts, mask_sp),
                "behavior": ModalityInput(behavior, behavior, attn, ts,
                                          mask_be),
            }
            return model.apply({"params": p}, mi, training=False).loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # --- lockstep loop ---------------------------------------------------
    order_rng = np.random.default_rng(args.seed)
    mask_rng = np.random.default_rng(args.seed + 1)
    objectives = (["encoding", "decoding", "token_masking"]
                  if args.objectives == "mixed" else ["decoding"])
    attn = np.ones((B, T), "int64")
    ts_arr = np.tile(np.arange(T, dtype="int64"), (B, 1))

    losses_ref, losses_jax, objs = [], [], []
    total_steps = args.steps + args.epochs_eval * (n_train // B)
    perm = order_rng.permutation(n_train)
    pos = 0
    for step in range(total_steps):
        if pos + B > n_train:
            perm = order_rng.permutation(n_train)
            pos = 0
        idx = perm[pos:pos + B]
        pos += B
        objective = objectives[step % len(objectives)]
        spikes = train.spikes[idx]
        behavior = train.behavior[idx]
        masks = step_masks(objective, mask_rng, B, T, N, n_beh,
                           args.mask_ratio)

        ref_opt.zero_grad()
        out = ref_model(ref_mod_dict(torch, spikes, behavior, attn, ts_arr,
                                     masks))
        out.loss.backward()
        ref_opt.step()

        params, opt_state, jloss = train_step(
            params, opt_state, jnp.asarray(spikes), jnp.asarray(behavior),
            jnp.asarray(attn), jnp.asarray(ts_arr),
            jnp.asarray(masks["ap"], jnp.int32),
            jnp.asarray(masks["behavior"], jnp.int32))

        if step < args.steps:
            losses_ref.append(float(out.loss))
            losses_jax.append(float(jloss))
            objs.append(objective)
        if step % 50 == 0:
            print(f"step {step:5d} [{objective:13s}] "
                  f"ref={float(out.loss):.6f} jax={float(jloss):.6f}")

    losses_ref = np.array(losses_ref)
    losses_jax = np.array(losses_jax)
    rel = np.abs(losses_ref - losses_jax) / np.maximum(np.abs(losses_ref),
                                                       1e-8)

    # --- decode R² on held-out trials, both sides ------------------------
    def decode_r2_ref():
        ref_model.train(False)
        sp, be = test.spikes, test.behavior
        Bt = sp.shape[0]
        masks = {"ap": np.zeros_like(sp, dtype="int64"),
                 "behavior": np.ones_like(be, dtype="int64")}
        with torch.no_grad():
            out = ref_model(ref_mod_dict(
                torch, sp, be, np.ones((Bt, T), "int64"),
                np.tile(np.arange(T, dtype="int64"), (Bt, 1)), masks))
        preds = out.mod_preds["behavior"].numpy()
        return [float(r) for r in
                compute_R2_main(be.reshape(-1, n_beh),
                                preds.reshape(-1, n_beh), clip=False)]

    def decode_r2_jax():
        sp, be = test.spikes, test.behavior
        Bt = sp.shape[0]
        attn_t = jnp.ones((Bt, T), jnp.int32)
        ts_t = jnp.tile(jnp.arange(T), (Bt, 1))
        mi = {
            "ap": ModalityInput(jnp.asarray(sp), jnp.asarray(sp), attn_t,
                                ts_t, jnp.zeros_like(jnp.asarray(sp),
                                                     jnp.int32)),
            "behavior": ModalityInput(jnp.asarray(be), jnp.asarray(be),
                                      attn_t, ts_t,
                                      jnp.ones_like(jnp.asarray(be),
                                                    jnp.int32)),
        }
        out = model.apply({"params": params}, mi, training=False)
        preds = np.asarray(out.mod_preds["behavior"])
        return [float(r) for r in
                compute_R2_main(be.reshape(-1, n_beh),
                                preds.reshape(-1, n_beh), clip=False)]

    r2_ref, r2_jax = decode_r2_ref(), decode_r2_jax()

    report = {
        "steps_compared": int(args.steps),
        "total_steps": int(total_steps),
        "loss_rel_divergence_mean": float(rel.mean()),
        "loss_rel_divergence_max": float(rel.max()),
        "loss_rel_divergence_p99": float(np.quantile(rel, 0.99)),
        "final_losses": {"ref": float(losses_ref[-1]),
                         "jax": float(losses_jax[-1])},
        "decode_r2_ref": r2_ref,
        "decode_r2_jax": r2_jax,
        "per_objective_final": {
            o: {"ref": float(losses_ref[np.array(objs) == o][-1]),
                "jax": float(losses_jax[np.array(objs) == o][-1])}
            for o in objectives},
        "config": vars(args),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
