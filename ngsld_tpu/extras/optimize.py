"""Box-constrained quasi-Newton maximization (findmax_bfgs equivalent).

The reference vendors an f2c translation of Nocedal's L-BFGS-B for its
sibling tools (/root/reference/shared/bfgs.cpp, findmax_bfgs at bfgs.h:54 —
vestigial, not compiled into ngsLD). This module provides the same
capability with a modern stack:

  * findmax(fn, x0, lower, upper)      — scipy L-BFGS-B on the host,
    numerical or user gradients (the reference's usage pattern), or
  * findmax_jax(fn, x0, ...)           — jax.scipy BFGS with autodiff and a
    logistic box reparameterization, fully jittable for on-device fitting.
"""

from __future__ import annotations

import numpy as np


def findmax(fn, x0, lower=None, upper=None, grad=None, **kw):
    """Maximize fn over a box. Mirrors findmax_bfgs' contract: returns
    (x_opt, f_max, converged)."""
    from scipy.optimize import minimize
    x0 = np.asarray(x0, float)
    bounds = None
    if lower is not None or upper is not None:
        lo = np.full_like(x0, -np.inf) if lower is None else np.asarray(lower, float)
        hi = np.full_like(x0, np.inf) if upper is None else np.asarray(upper, float)
        bounds = list(zip(lo, hi))
    def neg(x):
        return -fn(x)

    jac = (lambda x: -np.asarray(grad(x))) if grad is not None else None
    res = minimize(neg, x0, jac=jac, method="L-BFGS-B", bounds=bounds, **kw)
    return res.x, -res.fun, bool(res.success)


def findmax_jax(fn, x0, lower=None, upper=None, maxiter: int = 200):
    """Jittable box-constrained maximization: BFGS on a logistic
    reparameterization of the box (autodiff gradients)."""
    import jax
    import jax.numpy as jnp
    from jax.scipy.optimize import minimize as jmin

    x0 = jnp.asarray(x0, jnp.float32)
    if lower is None and upper is None:
        to_x = lambda z: z
        to_z = lambda x: x
    else:
        lo = jnp.asarray(lower, x0.dtype)
        hi = jnp.asarray(upper, x0.dtype)

        def to_x(z):
            return lo + (hi - lo) * jax.nn.sigmoid(z)

        def to_z(x):
            p = jnp.clip((x - lo) / (hi - lo), 1e-6, 1 - 1e-6)
            return jnp.log(p) - jnp.log1p(-p)

    def neg(z):
        return -fn(to_x(z))

    res = jmin(neg, to_z(x0), method="BFGS", options={"maxiter": maxiter})
    return to_x(res.x), -res.fun, res.success
