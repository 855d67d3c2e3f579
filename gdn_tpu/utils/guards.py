"""Numerical-health guards (SURVEY.md §5 'race detection/sanitizers'
row: XLA is data-race-free by construction; the TPU-native sanitizer
story is NaN/Inf detection on the training state).

``check_finite_tree`` is jittable (returns a bool you can branch on on
the host); ``assert_finite`` raises host-side with the offending paths;
``GuardedStep`` wraps a train step and raises as soon as loss or grads
go non-finite — the debugging mode the reference lacks entirely.
"""

from __future__ import annotations

from typing import Any, Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def check_finite_tree(tree: Any) -> jnp.ndarray:
    """Scalar bool: True iff every leaf is entirely finite (jittable)."""
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    flags = [
        jnp.all(jnp.isfinite(l.astype(jnp.float32)))
        for l in leaves
        if jnp.issubdtype(l.dtype, jnp.floating)
    ]
    if not flags:
        return jnp.bool_(True)
    return jnp.all(jnp.stack(flags))


def nonfinite_paths(tree: Any) -> List[str]:
    """Host-side: names of leaves containing NaN/Inf."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
    return bad


def assert_finite(tree: Any, what: str = "tree") -> None:
    bad = nonfinite_paths(tree)
    if bad:
        raise FloatingPointError(
            f"non-finite values in {what}: {', '.join(bad[:8])}"
            + ("..." if len(bad) > 8 else "")
        )


class GuardedStep:
    """Wraps a jitted train step; checks loss terms (cheap, every step)
    and optionally the full param tree (expensive, every `deep_every`)."""

    def __init__(self, step_fn: Callable, deep_every: int = 0):
        self._fn = step_fn
        self._deep_every = deep_every
        self._count = 0

    def __call__(self, state, *args) -> Tuple[Any, Any]:
        new_state, terms = self._fn(state, *args)
        self._count += 1
        assert_finite(terms, f"loss terms at call {self._count}")
        if self._deep_every and self._count % self._deep_every == 0:
            assert_finite(new_state.params, f"params at call {self._count}")
        return new_state, terms
