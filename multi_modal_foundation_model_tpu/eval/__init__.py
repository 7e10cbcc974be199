from .metrics import (
    bits_per_spike,
    compute_PSTH,
    compute_R2_main,
    compute_R2_psth,
    compute_all_psth,
    create_behavior_conditions,
    metrics_list,
    neg_log_likelihood,
    psth_and_trial_r2,
    r2_score_nanable,
)

__all__ = [
    "bits_per_spike",
    "compute_PSTH",
    "compute_R2_main",
    "compute_R2_psth",
    "compute_all_psth",
    "create_behavior_conditions",
    "metrics_list",
    "neg_log_likelihood",
    "psth_and_trial_r2",
    "r2_score_nanable",
]
