"""Scipy-free nonlinear conjugate gradient.

The reference's DTM M-step minimizes each word's T-dimensional objective
with ``scipy.optimize.fmin_cg`` (ldaseqmodel.py:1110-1114, gtol=1e-3).
scipy is not available in this environment, so this is a Polak–Ribière+
CG with Armijo backtracking — same stopping rule (inf-norm of the
gradient below ``gtol``). Line-search internals differ from scipy's
Wolfe search, so iterates are not bit-identical; convergence to the same
optimum is pinned by the ldaseq tests (finite-difference gradient checks,
gradient-norm at the solution, monotone bound).
"""

from __future__ import annotations

import numpy as np


def minimize_cg(f, grad, x0: np.ndarray, gtol: float = 1e-3,
                max_iter: int = 200) -> np.ndarray:
    x = np.asarray(x0, dtype=np.float64).copy()
    g = grad(x)
    fx = f(x)
    d = -g
    for _ in range(max_iter):
        if np.max(np.abs(g)) < gtol:
            break
        gd = float(g @ d)
        if gd >= 0:            # stale direction — restart steepest
            d = -g
            gd = float(g @ d)
            if gd >= 0:
                break          # zero gradient
        alpha = 1.0
        ok = False
        for _ls in range(60):
            xn = x + alpha * d
            fn = f(xn)
            if np.isfinite(fn) and fn <= fx + 1e-4 * alpha * gd:
                ok = True
                break
            alpha *= 0.5
        if not ok:
            break
        gn = grad(xn)
        denom = float(g @ g)
        beta = max(0.0, float(gn @ (gn - g)) / denom) if denom > 0 else 0.0
        d = -gn + beta * d
        x, g, fx = xn, gn, fn
    return x
