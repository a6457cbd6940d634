"""Exact optimal transport (earth mover's distance) in pure numpy.

The reference delegates WMD's transportation LP to POT's ``emd2``
(gensim/models/keyedvectors.py:918-1012 ``wmdistance``). POT is a compiled
network-simplex; neither it nor scipy exists in this environment, so this
module implements the classic *transportation simplex* (the specialization
of the primal simplex to the transportation polytope) from the published
algorithm: north-west-corner initial basis, dual variables by spanning-tree
traversal, Bland's smallest-index pivoting rule for guaranteed finite
termination under degeneracy.

Problem sizes here are tiny — m and n are the unique-token counts of two
documents (tens) — so an O((m+n)·mn)-per-pivot dense implementation is the
right trade: simple, exact, dependency-free. The *distributed* cost lives in
who calls this (one small LP per candidate pair inside an Arrow-batched
``applyInPandas``), never in the solver itself.

Correctness is pinned by tests/test_wmd.py against a brute-force LP-vertex
enumeration oracle (every basis of the transportation polytope solved and
checked) plus the RWMD-lower / feasible-plan-upper sandwich on random
instances.
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-11


class TransportError(RuntimeError):
    pass


def _nw_corner(a: np.ndarray, b: np.ndarray):
    """North-west corner rule: an initial basic feasible solution with
    exactly m+n-1 basic cells (zero-flow cells included when degenerate)."""
    m, n = len(a), len(b)
    ra, rb = a.copy(), b.copy()
    basis: list[tuple[int, int]] = []
    flow: dict[tuple[int, int], float] = {}
    i = j = 0
    while True:
        v = min(ra[i], rb[j])
        basis.append((i, j))
        flow[(i, j)] = v
        ra[i] -= v
        rb[j] -= v
        if i == m - 1 and j == n - 1:
            break
        # advance across the exhausted side; on a degenerate tie prefer the
        # row step so the walk still emits one cell per step (m+n-1 total)
        if ra[i] <= _EPS and i < m - 1:
            i += 1
        else:
            j += 1
    return basis, flow


def _duals(basis, cost, m, n):
    """Solve u_i + v_j = C_ij over the basis spanning tree (u_0 = 0)."""
    adj: dict[int, list[tuple[int, int, int]]] = {}
    for i, j in basis:
        adj.setdefault(i, []).append((m + j, i, j))
        adj.setdefault(m + j, []).append((i, i, j))
    u = np.full(m, np.nan)
    v = np.full(n, np.nan)
    u[0] = 0.0
    stack = [0]
    seen = {0}
    while stack:
        node = stack.pop()
        for nxt, ci, cj in adj.get(node, ()):
            if nxt in seen:
                continue
            seen.add(nxt)
            if nxt >= m:
                v[nxt - m] = cost[ci, cj] - u[ci]
            else:
                u[nxt] = cost[ci, cj] - v[cj]
            stack.append(nxt)
    if np.isnan(u).any() or np.isnan(v).any():
        raise TransportError("basis does not span (degenerate tree)")
    return u, v


def _cycle(basis, enter, m):
    """The unique alternating cycle created by adding ``enter`` to the basis
    tree: path between enter's row node and col node, edges = basis cells."""
    ei, ej = enter
    adj: dict[int, list[tuple[int, tuple[int, int]]]] = {}
    for i, j in basis:
        adj.setdefault(i, []).append((m + j, (i, j)))
        adj.setdefault(m + j, []).append((i, (i, j)))
    target = m + ej
    # BFS from the row node to the col node
    prev: dict[int, tuple[int, tuple[int, int]]] = {ei: (-1, (-1, -1))}
    queue = [ei]
    while queue:
        node = queue.pop(0)
        if node == target:
            break
        for nxt, cell in adj.get(node, ()):
            if nxt not in prev:
                prev[nxt] = (node, cell)
                queue.append(nxt)
    if target not in prev:
        raise TransportError("no cycle: basis is not a spanning tree")
    path_cells = []
    node = target
    while node != ei:
        parent, cell = prev[node]
        path_cells.append(cell)
        node = parent
    # cycle order: enter (+), then walk back from the col node — signs alternate
    return [enter] + path_cells


def emd(a, b, cost, max_iter: int | None = None):
    """Exact minimum-cost transportation: returns (total_cost, plan).

    ``a`` (m,) supplies and ``b`` (n,) demands must sum to the same mass
    (both are probability nbows in the WMD use); ``cost`` is (m, n).
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    cost = np.asarray(cost, dtype=np.float64)
    if a.ndim != 1 or b.ndim != 1 or cost.shape != (len(a), len(b)):
        raise ValueError("shape mismatch")
    if (a < -_EPS).any() or (b < -_EPS).any():
        raise ValueError("negative mass")
    if abs(a.sum() - b.sum()) > 1e-9 * max(a.sum(), b.sum(), 1.0):
        raise ValueError("unbalanced problem: sum(a) != sum(b)")
    ri = np.flatnonzero(a > _EPS)
    ci = np.flatnonzero(b > _EPS)
    plan = np.zeros_like(cost)
    if len(ri) == 0 or len(ci) == 0:
        return 0.0, plan
    aa, bb = a[ri], b[ci]
    # rescale demands so the reduced problem balances exactly
    bb = bb * (aa.sum() / bb.sum())
    C = cost[np.ix_(ri, ci)]
    m, n = len(aa), len(bb)
    basis, flow = _nw_corner(aa, bb)
    if max_iter is None:
        max_iter = 200 * (m + n) * max(m, n) + 1000
    basis_set = set(basis)
    for _ in range(max_iter):
        u, v = _duals(basis, C, m, n)
        red = C - u[:, None] - v[None, :]
        # Bland: the smallest-index cell with negative reduced cost enters
        enter = None
        scale = max(1.0, np.abs(C).max())
        for idx in range(m * n):
            i, j = divmod(idx, n)
            if (i, j) not in basis_set and red[i, j] < -1e-10 * scale:
                enter = (i, j)
                break
        if enter is None:
            total = sum(flow[c] * C[c] for c in basis)
            for (i, j) in basis:
                plan[ri[i], ci[j]] = flow[(i, j)]
            return float(total), plan
        cycle = _cycle(basis, enter, m)
        minus = cycle[1::2]
        theta = min(flow[c] for c in minus)
        # Bland: among ties, the smallest-index minus-cell leaves
        leave = min((c for c in minus if flow[c] <= theta + _EPS),
                    key=lambda c: c[0] * n + c[1])
        for k, c in enumerate(cycle):
            if c == enter:
                flow[c] = flow.get(c, 0.0) + theta
            else:
                flow[c] += theta if k % 2 == 0 else -theta
            if flow[c] < 0.0:
                flow[c] = 0.0  # clamp float fuzz
        basis_set.remove(leave)
        basis.remove(leave)
        del flow[leave]
        basis.append(enter)
        basis_set.add(enter)
    raise TransportError(f"no convergence in {max_iter} pivots")


def emd_bruteforce(a, b, cost):
    """Exact EMD by enumerating every basis (vertex) of the transportation
    polytope — O(C(mn, m+n-1)) so only for tiny instances. Independent
    oracle for :func:`emd` in tests."""
    from itertools import combinations

    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    cost = np.asarray(cost, dtype=np.float64)
    ri = np.flatnonzero(a > _EPS)
    ci = np.flatnonzero(b > _EPS)
    if len(ri) == 0 or len(ci) == 0:
        return 0.0
    aa, bb = a[ri], b[ci]
    bb = bb * (aa.sum() / bb.sum())
    C = cost[np.ix_(ri, ci)]
    m, n = len(aa), len(bb)
    cells = [(i, j) for i in range(m) for j in range(n)]
    rhs = np.concatenate([aa, bb])
    best = None
    for sub in combinations(cells, m + n - 1):
        A = np.zeros((m + n, len(sub)))
        for k, (i, j) in enumerate(sub):
            A[i, k] = 1.0
            A[m + j, k] = 1.0
        x, *_ = np.linalg.lstsq(A, rhs, rcond=None)
        if np.abs(A @ x - rhs).max() > 1e-8 or (x < -1e-8).any():
            continue
        val = float(sum(max(xi, 0.0) * C[i, j] for xi, (i, j) in zip(x, sub)))
        if best is None or val < best:
            best = val
    if best is None:
        raise TransportError("no feasible basis found")
    return best
