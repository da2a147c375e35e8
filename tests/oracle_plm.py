"""
Independent float64 oracle of the plmc objective, gradient, and
libLBFGS optimizer/stopping semantics.

This is the fit-level parity gate demanded by BASELINE ("bit-equivalent
EC ranks vs plmc"): no plmc binary exists in this environment and the
bundled reference EC files ship without their input alignment, so the
strongest buildable evidence is an implementation of plmc's *math* that
shares NOTHING with the production fitter:

- the objective/gradient below loop over sites and pairs with explicit
  index arithmetic on an upper-triangular shared-parameter layout
  (h: (L, q); J: (n_pairs, q, q) for i < j), in float64, while the
  production fitter (evcouplings_tpu/ops/plm.py) computes everything as
  flat (Lq, Lq) GEMMs in a jitted block scan;
- the optimizer is a literal two-loop L-BFGS with a strong-Wolfe
  linesearch and libLBFGS's relative-gradient stopping rule
  ||g|| <= eps * max(1, ||x||) — the contract the reference wrapper
  documents (reference couplings/tools.py:126-307: plmc links libLBFGS;
  convergence/status lines parsed at tools.py:20-108).

Objective (plmc pseudolikelihood, reference contract at
couplings/tools.py:126-307 and the .model format at model.py:317-400):

    f(h, J) = sum_s w_s sum_r [x_sr valid] *
                  ( log Z_sr - logit_sr(x_sr) )
              + lambda_h * sum_{i,a} h_i(a)^2
              + lambda_J * sum_{i<j,a,b} J_ij(a,b)^2
              + lambda_group * sum_{i<j} ||J_ij||_F

    logit_sr(a) = h_r(a) + sum_{j != r, x_sj valid} J_rj(a, x_sj)

with J_rj(a, b) := J_jr(b, a) for r > j (one shared parameter per
unordered pair), and "valid" meaning code >= 0 (plmc -g gap skipping /
excluded positions).

Deliberately slow and literal; only suitable for tiny MSAs.
"""

import numpy as np


# ---------------------------------------------------------------------------
# parameter layout: x = [h.ravel() | J_pairs.ravel()]
# J_pairs[p] is the (q, q) block of pair (i_p, j_p), i_p < j_p row-major
# ---------------------------------------------------------------------------

def pair_index(L):
    """Arrays (ii, jj) of the upper-triangular pair enumeration."""
    return np.triu_indices(L, k=1)


def pack(h, J_pairs):
    return np.concatenate([np.ravel(h), np.ravel(J_pairs)])


def unpack(x, L, q):
    n_pairs = L * (L - 1) // 2
    h = x[: L * q].reshape(L, q)
    J_pairs = x[L * q:].reshape(n_pairs, q, q)
    return h, J_pairs


def pairs_to_tensor(J_pairs, L, q):
    """(n_pairs, q, q) upper-triangle blocks -> full (L, L, q, q) tensor
    with J[j, i] = J[i, j]^T and zero diagonal blocks."""
    J = np.zeros((L, L, q, q))
    ii, jj = pair_index(L)
    for p, (i, j) in enumerate(zip(ii, jj)):
        J[i, j] = J_pairs[p]
        J[j, i] = J_pairs[p].T
    return J


def tensor_to_pairs(J, L, q):
    ii, jj = pair_index(L)
    return np.stack([J[i, j] for i, j in zip(ii, jj)])


# ---------------------------------------------------------------------------
# objective + gradient
# ---------------------------------------------------------------------------

def objective(x, codes, weights, q, lambda_h, lambda_J,
              lambda_group=0.0, group_eps=0.0):
    """plmc objective and gradient, float64.

    codes: (N, L) ints in [0, q) or -1 (excluded position).
    Returns (f, g) with g laid out like x.
    """
    codes = np.asarray(codes)
    weights = np.asarray(weights, dtype=np.float64)
    N, L = codes.shape
    h, J_pairs = unpack(np.asarray(x, dtype=np.float64), L, q)
    J = pairs_to_tensor(J_pairs, L, q)

    g_h = np.zeros((L, q))
    # gradient of the data term on the FULL tensor: g_full[r, j] holds
    # site r's conditional contribution; shared-parameter gradient is
    # assembled at the end as g_full[i, j] + g_full[j, i]^T
    g_full = np.zeros((L, L, q, q))
    f = 0.0

    valid = codes >= 0
    for r in range(L):
        active = valid[:, r]
        if not active.any():
            continue
        # logits for every sequence at site r: (N, q)
        logits = np.tile(h[r], (N, 1))
        for j in range(L):
            if j == r:
                continue
            cj = codes[:, j]
            vj = valid[:, j]
            if vj.any():
                logits[vj] += J[r, j][:, cj[vj]].T

        # stable log-sum-exp per sequence
        mx = logits.max(axis=1)
        e = np.exp(logits - mx[:, None])
        Z = e.sum(axis=1)
        log_Z = np.log(Z) + mx
        p = e / Z[:, None]

        obs = codes[:, r].copy()
        obs[~active] = 0    # placeholder, masked below
        logit_obs = logits[np.arange(N), obs]
        f += float(np.sum(weights * active * (log_Z - logit_obs)))

        # residual rows: w_s * (p_s - onehot(x_sr)) for active rows
        resid = p.copy()
        resid[np.arange(N), obs] -= 1.0
        resid *= (weights * active)[:, None]

        g_h[r] += resid.sum(axis=0)
        for j in range(L):
            if j == r:
                continue
            cj = codes[:, j]
            vj = valid[:, j] & active
            if vj.any():
                # g_full[r, j][a, b] += sum_{s: x_sj == b} resid[s, a]
                np.add.at(g_full[r, j].T, cj[vj], resid[vj])

    # regularizers
    f += lambda_h * float(np.sum(h ** 2))
    g_h += 2.0 * lambda_h * h

    f += lambda_J * float(np.sum(J_pairs ** 2))
    ii, jj = pair_index(L)
    g_J = np.stack([
        g_full[i, j] + g_full[j, i].T for i, j in zip(ii, jj)
    ]) if len(ii) else np.zeros((0, q, q))
    g_J += 2.0 * lambda_J * J_pairs

    if lambda_group > 0:
        ss = np.sum(J_pairs ** 2, axis=(1, 2))
        norms = np.sqrt(ss + group_eps)
        f += lambda_group * float(np.sum(norms))
        safe = np.where(norms > 0, norms, 1.0)
        g_J += lambda_group * J_pairs / safe[:, None, None]

    return f, pack(g_h, g_J)


# ---------------------------------------------------------------------------
# libLBFGS-style L-BFGS (two-loop recursion + strong-Wolfe linesearch,
# relative-gradient stopping)
# ---------------------------------------------------------------------------

def _wolfe_linesearch(fun, x, f0, g0, d, step0=1.0,
                      ftol=1e-4, gtol=0.9, max_ls=40):
    """Strong-Wolfe linesearch by bracket + bisection interpolation.

    Returns (step, f, g, n_evals) or step=0.0 on failure.
    """
    dg0 = float(np.dot(g0, d))
    if dg0 >= 0:
        return 0.0, f0, g0, 0

    lo, hi = 0.0, np.inf
    step = step0
    f_prev, g_prev = f0, g0
    for k in range(max_ls):
        f, g = fun(x + step * d)
        dg = float(np.dot(g, d))
        if f > f0 + ftol * step * dg0:
            hi = step                     # Armijo violated: shrink
        elif abs(dg) > gtol * abs(dg0):
            if dg < 0:
                lo = step                 # still descending: grow
                f_prev, g_prev = f, g
            else:
                hi = step
        else:
            return step, f, g, k + 1      # strong Wolfe satisfied
        step = 0.5 * (lo + hi) if np.isfinite(hi) else 2.0 * step
        if step <= 0 or not np.isfinite(step):
            break
    # fall back to the best Armijo point seen, else fail
    if lo > 0:
        return lo, f_prev, g_prev, max_ls
    return 0.0, f0, g0, max_ls


def lbfgs(fun, x0, m=6, epsilon=1e-5, max_iter=100):
    """Two-loop L-BFGS with libLBFGS semantics.

    fun(x) -> (f, g). Stops when ||g|| <= epsilon * max(1, ||x||)
    (libLBFGS's relative criterion, the rule the production fitter
    mirrors in PlmConfig.conv_tol). m=6 is the libLBFGS default
    history size.

    Returns dict(x, f, g, n_iter, converged, trace) where trace is a
    list of per-iteration (f, ||g||, ||x||) records — the quantities
    plmc prints in its iteration log.
    """
    x = np.asarray(x0, dtype=np.float64).copy()
    f, g = fun(x)
    s_hist, y_hist, rho = [], [], []
    trace = []
    n_stalled = 0
    converged = bool(
        np.linalg.norm(g) <= epsilon * max(1.0, np.linalg.norm(x))
    )

    it = 0
    while it < max_iter and not converged:
        # two-loop recursion
        d = -g.copy()
        alphas = []
        for s, y, r in zip(reversed(s_hist), reversed(y_hist),
                           reversed(rho)):
            a = r * np.dot(s, d)
            alphas.append(a)
            d -= a * y
        if s_hist:
            gamma = (np.dot(s_hist[-1], y_hist[-1])
                     / np.dot(y_hist[-1], y_hist[-1]))
            d *= gamma
        for (s, y, r), a in zip(zip(s_hist, y_hist, rho),
                                reversed(alphas)):
            d += (a - r * np.dot(y, d)) * s

        # libLBFGS starts the very first iteration at step 1/||d||
        step0 = 1.0 / np.linalg.norm(d) if it == 0 else 1.0
        step, f_new, g_new, _ = _wolfe_linesearch(
            fun, x, f, g, d, step0=step0
        )
        if step == 0.0:
            break                           # linesearch failure: stop

        x_new = x + step * d
        s = x_new - x
        y = g_new - g
        sy = float(np.dot(s, y))
        if sy > 1e-10:
            s_hist.append(s)
            y_hist.append(y)
            rho.append(1.0 / sy)
            if len(s_hist) > m:
                s_hist.pop(0)
                y_hist.pop(0)
                rho.pop(0)

        stalled = f - f_new <= 1e-15 * max(1.0, abs(f))
        x, f, g = x_new, f_new, g_new
        it += 1
        gnorm = float(np.linalg.norm(g))
        xnorm = float(np.linalg.norm(x))
        trace.append((f, gnorm, xnorm))
        converged = gnorm <= epsilon * max(1.0, xnorm)

        # float64 rounding floor: the objective can no longer resolve
        # descent (libLBFGS reports this as a rounding-error stop)
        n_stalled = n_stalled + 1 if stalled else 0
        if n_stalled >= 5:
            break

    return {
        "x": x, "f": f, "g": g, "n_iter": it,
        "converged": converged, "trace": trace,
    }


def newton_polish(fun, x, max_steps=10, gtol=1e-11, cg_iters=200):
    """Polish a near-optimal point of a strictly convex objective to
    (close to) the true optimum with Newton-CG steps, using
    finite-difference Hessian-vector products of the gradient.

    L-BFGS in float64 stalls at the objective's rounding floor
    (gradient norm ~1e-7 on these problems); the Newton step does not
    need resolvable objective decrease, only the gradient, so it pushes
    ||g|| to ~1e-11 and pins the oracle optimum tightly enough for
    1e-6-level parameter gates downstream.
    """
    x = np.asarray(x, dtype=np.float64).copy()

    def hvp(x, v):
        nv = np.linalg.norm(v)
        if nv == 0:
            return np.zeros_like(v)
        eps = 1e-6 / nv
        _, gp = fun(x + eps * v)
        _, gm = fun(x - eps * v)
        return (gp - gm) / (2 * eps)

    def cg_solve(x, b, tol):
        """Solve H s = b by conjugate gradients (H SPD here)."""
        s = np.zeros_like(b)
        r = b.copy()
        p = r.copy()
        rs = float(np.dot(r, r))
        for _ in range(cg_iters):
            if np.sqrt(rs) <= tol:
                break
            Hp = hvp(x, p)
            alpha = rs / float(np.dot(p, Hp))
            s += alpha * p
            r -= alpha * Hp
            rs_new = float(np.dot(r, r))
            p = r + (rs_new / rs) * p
            rs = rs_new
        return s

    f, g = fun(x)
    for _ in range(max_steps):
        gnorm = np.linalg.norm(g)
        if gnorm <= gtol:
            break
        step = cg_solve(x, g, tol=0.1 * min(gnorm, gnorm ** 2 * 1e6))
        x_new = x - step
        f_new, g_new = fun(x_new)
        if np.linalg.norm(g_new) >= gnorm:
            break
        x, f, g = x_new, f_new, g_new
    return x, f, g


def fit(codes, weights, q, lambda_h=0.01, lambda_J=0.01,
        lambda_group=0.0, group_eps=0.0, epsilon=1e-8, max_iter=2000,
        m=6, polish=False):
    """Oracle PLM fit. Returns dict with h (L, q), J (L, L, q, q)
    symmetric tensor, and the optimizer result.

    polish=True follows the L-BFGS run with Newton-CG polishing, which
    pushes past the float64 rounding floor (||g|| ~1e-7) down to
    ~1e-11 — use when the test gates parameter values, not just ranks.
    """
    codes = np.asarray(codes)
    N, L = codes.shape
    x0 = np.zeros(L * q + (L * (L - 1) // 2) * q * q)

    def fg(x):
        return objective(x, codes, weights, q, lambda_h, lambda_J,
                         lambda_group, group_eps)

    res = lbfgs(fg, x0, m=m, epsilon=epsilon, max_iter=max_iter)
    if polish:
        x, f, g = newton_polish(fg, res["x"])
        converged = bool(
            np.linalg.norm(g)
            <= epsilon * max(1.0, np.linalg.norm(x))
        )
        res = dict(res, x=x, f=f, g=g, converged=converged)
    h, J_pairs = unpack(res["x"], L, q)
    return {
        "h": h,
        "J": pairs_to_tensor(J_pairs, L, q),
        "result": res,
    }


def fit_prox(codes, weights, q, lambda_h=0.01, lambda_J=0.01,
             lambda_group=0.1, tol=1e-10, max_iter=4000):
    """Oracle fit of the EXACT nonsmooth group-L1 objective

        smooth(h, J) + lambda_group * sum_{i<j} ||J_ij||_F

    in float64 on the shared (h, upper-blocks) parametrization, with
    an explicit optimality CERTIFICATE rather than trust in any one
    iterative method:

    1. accelerated proximal gradient (with backtracking + restart)
       locates the solution and its active set (which pair blocks are
       exactly zero);
    2. zero blocks are frozen and the reduced problem — smooth away
       from the group-norm kink — is polished to ||g|| ~1e-11 by
       Newton-CG;
    3. the KKT conditions are checked directly: every zero block must
       satisfy ||grad_B smooth|| <= lambda_group (the subdifferential
       condition), with the margin reported.

    Returns the same dict shape as fit(), plus zero_pairs and
    kkt_margin (min over zero blocks of lambda_group - ||grad_B||;
    positive = certified).
    """
    codes = np.asarray(codes)
    N, L = codes.shape
    n_pairs = L * (L - 1) // 2
    dim_h = L * q
    dim = dim_h + n_pairs * q * q

    def smooth_fg(x):
        return objective(x, codes, weights, q, lambda_h, lambda_J,
                         lambda_group=0.0)

    def block_norms(x):
        blocks = x[dim_h:].reshape(n_pairs, q, q)
        return np.sqrt(np.sum(blocks ** 2, axis=(1, 2)))

    def prox(x, s):
        out = x.copy()
        blocks = out[dim_h:].reshape(n_pairs, q, q)
        norms = np.sqrt(np.sum(blocks ** 2, axis=(1, 2)))
        scale = np.maximum(
            0.0, 1.0 - (s * lambda_group) / np.maximum(norms, 1e-300)
        )
        out[dim_h:] = (blocks * scale[:, None, None]).ravel()
        return out

    def penalty(x):
        return lambda_group * float(block_norms(x).sum())

    # --- phase 1: FISTA with backtracking + function restart --------
    x = np.zeros(dim)
    y = x.copy()
    x_prev = x.copy()
    tk = 1.0
    s = 1.0
    f_full_prev = np.inf
    converged = False
    it = 0
    while it < max_iter and not converged:
        f_y, g_y = smooth_fg(y)
        for _ in range(60):
            x_new = prox(y - s * g_y, s)
            f_new, _g = smooth_fg(x_new)
            d = x_new - y
            if f_new <= (f_y + float(np.dot(g_y, d))
                         + float(np.dot(d, d)) / (2 * s)
                         + 1e-12 * max(1.0, abs(f_y))):
                break
            s *= 0.5
        gmap = np.linalg.norm(x_new - y) / s
        f_full = f_new + penalty(x_new)
        if f_full > f_full_prev:        # adaptive restart
            tk, y = 1.0, x_new
        else:
            tk_next = 0.5 * (1.0 + np.sqrt(1.0 + 4.0 * tk * tk))
            y = x_new + ((tk - 1.0) / tk_next) * (x_new - x_prev)
            tk = tk_next
        x_prev, x = x_new, x_new
        f_full_prev = f_full
        s *= 1.2
        it += 1
        converged = gmap <= tol * max(1.0, np.linalg.norm(x))

    # --- phase 2: active-set Newton polish --------------------------
    norms = block_norms(x)
    active = norms > 0
    mask = np.ones(dim, dtype=bool)
    for p in np.flatnonzero(~active):
        start = dim_h + p * q * q
        mask[start:start + q * q] = False
    idx = np.flatnonzero(mask)

    def reduced_fg(xr):
        xf = np.zeros(dim)
        xf[idx] = xr
        # exact penalty, smooth on the active set (group_eps = 0 with
        # safe division; all active norms stay > 0 near the optimum)
        f, g = objective(xf, codes, weights, q, lambda_h, lambda_J,
                         lambda_group=lambda_group, group_eps=0.0)
        return f, g[idx]

    xr, f_red, g_red = newton_polish(reduced_fg, x[idx])
    x = np.zeros(dim)
    x[idx] = xr

    # --- phase 3: KKT certificate for the zero blocks ---------------
    _, g_smooth = smooth_fg(x)
    gJ = g_smooth[dim_h:].reshape(n_pairs, q, q)
    kkt_margin = np.inf
    for p in np.flatnonzero(~active):
        kkt_margin = min(
            kkt_margin,
            lambda_group - float(np.sqrt((gJ[p] ** 2).sum())),
        )

    h, J_pairs = unpack(x, L, q)
    return {
        "h": h,
        "J": pairs_to_tensor(J_pairs, L, q),
        "zero_pairs": np.flatnonzero(~active),
        "kkt_margin": float(kkt_margin),
        "result": {
            "x": x, "f": f_red, "g": g_red, "n_iter": it,
            "converged": bool(
                np.linalg.norm(g_red) <= 1e-9
                and (kkt_margin > 0 or active.all())
            ),
        },
    }


# ---------------------------------------------------------------------------
# synthetic test alignments with planted covariation
# ---------------------------------------------------------------------------

def synthetic_msa(N, L, q, seed=0, n_coupled=3, copy_prob=0.85,
                  gap_frac=0.0):
    """Deterministic random MSA with planted column couplings.

    n_coupled disjoint column pairs (2k, 2k+1) are correlated: column
    2k+1 copies (a fixed permutation of) column 2k with probability
    copy_prob. This plants strong, well-separated EC signals so rank
    comparisons have no near-ties. gap_frac > 0 replaces entries with
    -1 (excluded positions, the plmc -g regime).
    """
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, q, size=(N, L))
    perm = rng.permutation(q)
    for k in range(n_coupled):
        i, j = 2 * k, 2 * k + 1
        copy = rng.random(N) < copy_prob
        codes[copy, j] = perm[codes[copy, i]]
    if gap_frac > 0:
        mask = rng.random((N, L)) < gap_frac
        codes = np.where(mask, -1, codes)
    return codes.astype(np.int8)
