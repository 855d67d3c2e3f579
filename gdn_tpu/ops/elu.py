"""ELU with an output-form custom VJP (zero extra residual).

Autodiff of ``elu`` saves the PRE-activation ``x`` to compute the
backward ``where(x > 0, g, g * exp(x))`` — for the decoder's bare
deconv ELUs (models/blocks.py UpBlock deconv branch) that is a full
feature-map HBM write in the forward plus a read in the backward,
~218 MB per decoder scale at B=128 KITTI res.

But ELU's derivative is a function of its OUTPUT alone:

    d elu(x) / dx = 1        if x > 0   (y > 0)
                  = exp(x)   otherwise  = y + 1     (exact identity)

and the output is already kept alive for the backward of the
following conv (its weight-gradient contracts against its input), so
an output-form VJP adds NO residual at all: the pre-activation is
never materialized.  SURVEY.md §2.12 native-tier rationale: this is
the same minimal-residual idea as ops/groupnorm.py
``group_norm_elu_analytic``, applied to the un-normed activation.

Exactness: for x <= 0, exp(x) == elu(x) + 1 identically; at x == 0
both forms give 1.  Gradient equivalence vs autodiff is tested in
tests/test_ops.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def elu_saveout(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.elu(x)


def _fwd(x):
    y = jax.nn.elu(x)
    return y, y


def _bwd(y, g):
    one = jnp.ones((), y.dtype)
    return (g * jnp.where(y > 0, one, y + one),)


elu_saveout.defvjp(_fwd, _bwd)
