"""Constant-shape inclusive scans (Hillis-Steele) over pytrees.

jax.lax.associative_scan's odd/even recursion materializes ~2 distinct slice
shapes per level; with field/point combine graphs every distinct shape costs
a fresh (tens of seconds) XLA compile. Hillis-Steele trades work efficiency
(n log n combines instead of 2n) for exactly ONE compile shape per array
length and log2(n) dispatches — the right trade on both backends here, since
the combines are wide vectorized limb kernels and compile time, not flops,
is the binding constraint.

The combine need not be given an identity element: shifted-in lanes are
masked out explicitly.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def _shift_fwd(tree: Any, d: int) -> Any:
    """Shift every leaf forward by d along axis 0 (zero-fill front)."""
    def f(a):
        pad = jnp.zeros((d,) + a.shape[1:], a.dtype)
        return jnp.concatenate([pad, a[:-d]], axis=0)

    return jax.tree_util.tree_map(f, tree)


def _shift_back(tree: Any, d: int) -> Any:
    def f(a):
        pad = jnp.zeros((d,) + a.shape[1:], a.dtype)
        return jnp.concatenate([a[d:], pad], axis=0)

    return jax.tree_util.tree_map(f, tree)


def _select(keep_new: jnp.ndarray, new: Any, old: Any) -> Any:
    def f(a, b):
        mask = keep_new.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(mask, a, b).astype(a.dtype)

    return jax.tree_util.tree_map(f, new, old)


def hillis_scan(
    combine: Callable[[Any, Any], Any],
    xs: Any,
    reverse: bool = False,
) -> Any:
    """Inclusive scan along axis 0 of a pytree with an associative combine.

    combine(prev, cur) must be vectorized over axis 0. All intermediate
    arrays keep the input shape.
    """
    leaves = jax.tree_util.tree_leaves(xs)
    n = leaves[0].shape[0]
    idx = jnp.arange(n)
    x = xs
    d = 1
    while d < n:
        if reverse:
            # suffix scan: x_j <- combine(x_j, x_{j+d}) (sequence order)
            shifted = _shift_back(x, d)
            valid = idx < (n - d)
            combined = combine(x, shifted)
        else:
            shifted = _shift_fwd(x, d)
            valid = idx >= d
            combined = combine(shifted, x)
        x = _select(valid, combined, x)
        d <<= 1
    return x
