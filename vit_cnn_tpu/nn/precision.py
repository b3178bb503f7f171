"""Mixed-precision policy: bfloat16 compute on the MXU.

TPU matmuls/convs hit peak throughput in bfloat16. Rather than threading a
dtype through every module in the zoo, the policy is applied at the
``apply`` boundary: parameters and inputs are cast to bf16 for the forward
computation and logits are returned in float32. Master parameters,
optimizer state, and the full-scene probability accumulator stay float32
(the scatter-add accumulation is where precision actually matters,
SURVEY.md §7 hard part #5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast float leaves of a pytree to ``dtype``; leave ints/bools alone."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def bf16_apply(apply_fn):
    """Wrap ``module.apply`` so the forward runs in bfloat16.

    Works for any zoo model: ``variables`` and array inputs are cast to
    bf16, float outputs back to f32 (tuples — e.g. (logits, recon) — are
    mapped leaf-wise).
    """

    def wrapped(variables, *args, **kwargs):
        variables = cast_floating(variables, jnp.bfloat16)
        args = tuple(cast_floating(a, jnp.bfloat16) for a in args)
        out = apply_fn(variables, *args, **kwargs)
        return cast_floating(out, jnp.float32)

    return wrapped
