"""Shared plumbing for the entry scripts (session loading, mesh, log dirs).

The reference entry scripts hard-code SLURM paths and the HF hub
(``/root/reference/src/train_multi_modal.py:26-32,85-120``); these helpers
add a ``--synthetic`` path so every script runs offline, and build the
JAX device mesh that replaces ``accelerate``.
"""

from __future__ import annotations

import os
import sys


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Some environments pin JAX_PLATFORMS at interpreter startup; MMFM_PLATFORM
# provides a working override (e.g. MMFM_PLATFORM=cpu for offline runs).
if os.environ.get("MMFM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MMFM_PLATFORM"])

# hardware PRNG for the heavy dropout/masking draw volume (set
# MMFM_PRNG=threefry2x32 to restore the default stream)
jax.config.update("jax_default_prng_impl",
                  os.environ.get("MMFM_PRNG", "rbg"))

# persistent compilation cache: TPU compiles cost 20-275 s through remote
# backends, and the entry scripts recompile identical steps on every
# invocation without this. MMFM_COMPILE_CACHE= (empty) disables.
_cache_dir = os.environ.get("MMFM_COMPILE_CACHE",
                            os.path.expanduser("~/.cache/mmfm_jax"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from multi_modal_foundation_model_tpu.data.session import (  # noqa: E402
    SessionSplits, load_ibl_session, synthetic_splits)

DEFAULT_EID = "db4df448-e449-4a6f-a0e7-288711e7a75a"


def apply_config_overrides(config, pairs):
    """Dotted CLI kwargs (``--set a.b.c=1``) merged into a loaded config —
    the reference ParseKwargs surface (``config_utils.py:84-141``)."""
    from multi_modal_foundation_model_tpu.config import (config_from_kwargs,
                                                         update_config)
    if not pairs:
        return config
    kwargs = {}
    for pair in pairs:
        key, _, value = pair.partition("=")
        assert value != "", f"--set expects key=value, got {pair!r}"
        kwargs[key] = value
    return update_config(config, config_from_kwargs(kwargs))


def add_common_args(ap):
    ap.add_argument("--set", dest="config_overrides", action="append",
                    default=[], metavar="KEY=VALUE",
                    help="dotted config override, e.g. --set optimizer.lr=3e-4")
    ap.add_argument("--eid", type=str, default=DEFAULT_EID)
    ap.add_argument("--base_path", type=str, default="results")
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--synthetic", action="store_true",
                    help="use an offline synthetic session instead of the HF hub")
    ap.add_argument("--n_neurons", type=int, default=668,
                    help="synthetic session size (ignored with real data)")
    ap.add_argument("--n_trials", type=int, default=400)
    ap.add_argument("--num_epochs", type=int, default=None,
                    help="override config num_epochs")
    ap.add_argument("--dp", type=int, default=-1,
                    help="data-parallel devices; -1 = all, 1 = single")
    ap.add_argument("--device_resident", action="store_true",
                    help="keep each split resident in HBM and gather "
                         "batches on device (removes per-batch host->device "
                         "transfer from the training loop)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel ('model' mesh axis) size; >1 "
                         "shards attention/MLP/tokenizer params per "
                         "parallel/partition.py (composes with the fused "
                         "Pallas attention via shard_map over heads)")
    return ap


def warn_unsupported(args, *flags: str) -> None:
    """Emit a warning for common flags this entry point does not honor
    (e.g. --device_resident on the baseline trainer) instead of silently
    dropping them."""
    import warnings

    defaults = {"device_resident": False, "tp": 1, "dp": -1}
    for f in flags:
        if getattr(args, f, defaults.get(f)) != defaults.get(f):
            warnings.warn(f"--{f} is not supported by this script and is "
                          "ignored", stacklevel=2)


def get_session(args) -> SessionSplits:
    unaligned = bool(getattr(args, "unaligned", False))
    if args.synthetic:
        # synthetic "unaligned" sessions are the same generator; the
        # unaligned distinction is in the eval path (no task-condition
        # PSTHs — harness is_aligned=False)
        return synthetic_splits(seed=args.seed, n_trials=args.n_trials,
                                n_neurons=args.n_neurons, eid=args.eid)
    return load_ibl_session(args.eid, aligned=not unaligned)


def build_mesh(dp: int, tp: int = 1):
    """Mesh over ('data',) or ('data','model'); None for single-device."""
    from multi_modal_foundation_model_tpu.parallel import \
        build_mesh as _build_mesh
    return _build_mesh(dp, tp=tp)


def log_dir_for(base_path: str, eid: str, modal_filter, model_name: str) -> str:
    """Reference results layout (``train_baseline.py:60-67``)."""
    return os.path.join(
        base_path, "results", f"ses-{eid}", "set-train",
        f"inModal-{'-'.join(modal_filter['input'])}",
        f"outModal-{'-'.join(modal_filter['output'])}",
        model_name)


def guard_overwrite(log_dir: str, overwrite: bool):
    marker = os.path.join(log_dir, "model_last")
    assert not os.path.exists(marker) or overwrite, \
        f"checkpoint exists at {marker} and --overwrite not set"
