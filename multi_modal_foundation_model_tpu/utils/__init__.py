from .plotting import plot_condition_avg_r2, plot_gt_pred, plot_neurons_r2
from .prewarm import aot_compile, retry_transient
from .profiling import MFUTracker, StepTimer, trace_context
from .seeding import set_seed

__all__ = [
    "MFUTracker",
    "StepTimer",
    "aot_compile",
    "retry_transient",
    "plot_condition_avg_r2",
    "plot_gt_pred",
    "plot_neurons_r2",
    "set_seed",
    "trace_context",
]
