"""Seeding (reference ``set_seed``, ``/root/reference/src/utils/utils.py:20-29``).

JAX's RNG is functional — reproducibility flows from explicit PRNG keys
(trainers derive every stochastic choice from ``fold_in(PRNGKey(seed),
step)``), so unlike the torch original there is no global device RNG to
pin. This seeds the host-side generators that remain (numpy/python, used
by the loaders' shuffle order and host-side scheme sampling defaults).
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int, verbose: bool = True) -> None:
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    random.seed(seed)
    if verbose:
        print(f"seed set to {seed}")
