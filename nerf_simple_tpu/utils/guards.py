"""Numerical-health guards (the functional-purity analogue of the race
detectors / sanitizers the reference lacks — SURVEY.md §5).

Two tools:

- ``checked(fn)``: wrap a jittable function with ``checkify`` so NaN/Inf
  produced anywhere inside surfaces as a host-side error with a location,
  instead of silently poisoning training. Zero cost when unused; the
  ``debug_nan: true`` train-config flag wraps the whole train step with it
  (train/step.py::build_train_step).

- ``assert_finite(tree, name)``: host-side post-hoc check of any pytree
  (used by the train driver on loss values at log boundaries).
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.experimental import checkify


def checked(fn: Callable) -> Callable:
    """Return a wrapped ``fn`` that raises on NaN/Inf/OOB inside jit.

    Usage::

        step = checked(build_train_step(cfg, model))
        state, losses = step(state, rays, pixels, key)  # raises on NaN
    """
    cfn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks
    )

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite(tree, name: str = "tree") -> None:
    """Raise ValueError if any leaf of ``tree`` contains NaN/Inf."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.isfinite(a).all():
            keys = "/".join(str(p) for p in path)
            raise ValueError(
                f"non-finite values in {name}[{keys}]: "
                f"{np.isnan(a).sum()} NaN, {np.isinf(a).sum()} Inf"
            )
