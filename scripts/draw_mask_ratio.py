"""Mask-ratio sweep plot: decoding R² + encoding bits/spike vs mask ratio.

Parity with ``/root/reference/src/draw/draw_mask_ratio.py`` — including the
published comparison constants (the only quantitative baselines in the
reference repo, ``draw_mask_ratio.py:23-37``; see BASELINE.md). Reads the
eval artifacts produced by scripts/eval_multi_modal.py:
``<result_dir>/ratio-<r>/.../modal_behavior/r2.npy`` and
``.../modal_spike/bps.npy``.
"""

import argparse
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

BEHAV_MOD = ["wheel-speed", "whisker-motion-energy"]

LINEAR_ENCODING_BASELINE = -1.45
LINEAR_DECODING_BASELINE = {"wheel-speed": 0.46,
                            "whisker-motion-energy": 0.55}
FOURM_ENCODING_BASELINE = 0.19
FOURM_DECODING_BASELINE = {"wheel-speed": 0.64,
                           "whisker-motion-energy": 0.70}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--result_dir", type=str, required=True,
                    help="dir containing ratio-<r>/ eval artifact subdirs")
    ap.add_argument("--mask_ratios", type=float, nargs="*",
                    default=[0.1, 0.2, 0.3, 0.4, 0.5])
    ap.add_argument("--out", type=str,
                    default="mask_ratio_vs_decoding_r2_encoding_bps.png")
    ap.add_argument("--show_linear_baseline", action="store_true")
    args = ap.parse_args()

    decoding_res, encoding_res = {}, {}
    for ratio in args.mask_ratios:
        dec = os.path.join(args.result_dir, f"ratio-{ratio}",
                           "modal_behavior", "r2.npy")
        enc = os.path.join(args.result_dir, f"ratio-{ratio}",
                           "modal_spike", "bps.npy")
        if not (os.path.exists(dec) and os.path.exists(enc)):
            print(f"skipping ratio {ratio}: missing artifacts")
            continue
        decoding_res[ratio] = np.load(dec, allow_pickle=True).item()
        encoding_res[ratio] = np.nanmean(np.load(enc, allow_pickle=True))

    if not decoding_res:
        raise SystemExit("no eval artifacts found under --result_dir")

    fig, ax = plt.subplots(1, 2, figsize=(20, 10))
    colors = plt.get_cmap("tab10")
    for i, behav in enumerate(BEHAV_MOD):
        r2s = [decoding_res[r][f"{behav}_r2_trial"] for r in decoding_res]
        ax[0].plot(list(decoding_res.keys()), r2s, label=behav,
                   color=colors(i))
        ax[0].axhline(y=FOURM_DECODING_BASELINE[behav], color=colors(i),
                      linestyle="--", label=f"{behav} 4M Decoding Baseline")
        if args.show_linear_baseline:
            ax[0].axhline(y=LINEAR_DECODING_BASELINE[behav], color=colors(i),
                          linestyle=":",
                          label=f"{behav} Linear Decoding Baseline")
    ax[0].set_xlabel("Mask Ratio")
    ax[0].set_ylabel("R2")
    ax[0].set_title("Decoding R2")
    ax[0].legend()
    ax[0].grid()

    ax[1].plot(list(encoding_res.keys()), list(encoding_res.values()),
               color="g")
    ax[1].axhline(y=FOURM_ENCODING_BASELINE, color="g", linestyle="--",
                  label="4M Encoding Baseline")
    if args.show_linear_baseline:
        ax[1].axhline(y=LINEAR_ENCODING_BASELINE, color="r", linestyle=":",
                      label="Linear Encoding Baseline")
    ax[1].set_xlabel("Mask Ratio")
    ax[1].set_ylabel("BPS")
    ax[1].set_title("Encoding BPS")
    ax[1].legend()

    fig.suptitle("Mask Ratio vs. Decoding R2 and Encoding BPS")
    fig.tight_layout(rect=[0, 0.03, 1, 0.95])
    fig.savefig(args.out)
    print("saved:", args.out)


if __name__ == "__main__":
    main()
