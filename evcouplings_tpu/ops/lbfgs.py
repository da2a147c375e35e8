"""Scan-chained limited-memory BFGS on flat parameter vectors.

This is the production LBFGS engine behind ``fit_plm(solver="lbfgs")``
(the plmc-parity default; reference fit: external plmc C binary driven
by couplings/tools.py:126-307, which links libLBFGS). optax's
``optax.lbfgs`` + zoom linesearch is numerically fine but structurally
expensive on large dense problems: every inner step runs dozens of
pytree maps over the ~45 MB coupling matrix and the zoom linesearch
adds a deep while_loop state machine — measured ~30 ms/iteration of
pure overhead on TPU v5e on top of the 1-2 gradient evaluations
(~5 ms each) an iteration actually needs.

Here the parameters live in ONE flat vector, the (m, D) history is two
dense arrays indexed by a rolling slot counter, the two-loop recursion
is a pair of ``lax.fori_loop``s of fused dot/axpy passes (empty slots
are masked by rho == 0), and the linesearch is libLBFGS's
backtracking-with-strong-Wolfe rule (halve on Armijo/overshoot
failure, grow 2.1x while the directional derivative is still steeply
negative) in a bounded ``lax.while_loop``. Iterations are chained
on-device with ``lax.scan`` so a host round trip through the TPU
tunnel (~5 ms) is paid once per chunk, not once per iteration.

Cost per iteration beyond gradient evals: ~4m+3 dot/axpy streams over
D floats (m=5 history), all HBM-bandwidth bound — ~3 ms at D = 11.3M
on v5e versus optax's ~30 ms.
"""

import jax.numpy as jnp
from jax import lax

# libLBFGS-compatible linesearch constants (strong Wolfe).
# CROSS-MODULE CONTRACT: ops/plm_sites.py imports these for its
# batched per-site engine, which must stay semantics-identical to this
# scalar engine (and to the f64 oracle in tests/oracle_plm.py) — treat
# them as pinned public values despite the underscore names.
_C1 = 1e-4          # Armijo (sufficient decrease)
_C2 = 0.9           # curvature, libLBFGS wolfe default for LBFGS
_GROW = 2.1         # trial-step growth while curvature says "too short"
_SHRINK = 0.5       # trial-step backtracking factor
# Skip the history update if dot(s, y) falls below this ABSOLUTE
# threshold. Deliberate deviation from libLBFGS (which never skips and
# would divide by a tiny/negative ys after an inexact linesearch): the
# skip keeps rho finite, and empty/skipped slots vanish via rho == 0.
# The absolute form is part of the pinned fit semantics (golden
# fixtures + the f64 oracle share it); a problem scaled so that
# healthy curvature pairs sit near 1e-10 would degrade to steepest
# descent — at such scales rescale the objective, don't retune this.
_MIN_CURVATURE = 1e-10


def init_lbfgs_state(x, value, grad, m=5):
    """History + carried evaluation for a chunked LBFGS run.

    ``value``/``grad`` must be the objective evaluated at ``x`` — the
    accepted linesearch point of each iteration is reused as the next
    iteration's evaluation, so the objective is evaluated exactly once
    per linesearch trial and never re-evaluated at chunk boundaries.
    """
    d = x.shape[0]
    f = x.dtype
    return {
        "s_hist": jnp.zeros((m, d), dtype=f),
        "y_hist": jnp.zeros((m, d), dtype=f),
        "rho": jnp.zeros((m,), dtype=f),       # 0 marks an empty slot
        "gamma": jnp.ones((), dtype=f),        # H0 scaling dot(s,y)/dot(y,y)
        "count": jnp.zeros((), dtype=jnp.int32),  # accepted iterations
        "nevals": jnp.zeros((), dtype=jnp.int32),  # total linesearch evals
        "value": jnp.asarray(value, dtype=f),
        "grad": grad.astype(f),
        "converged": jnp.zeros((), dtype=bool),
        # linesearch failure (rounding error / max_ls exhaustion) is
        # NOT convergence — libLBFGS reports LBFGSERR_ROUNDING_ERROR /
        # _MAXIMUMLINESEARCH there; tracked separately so callers are
        # not told a frozen fit succeeded
        "ls_failed": jnp.zeros((), dtype=bool),
    }


def _two_loop_direction(state, m):
    """d = -H g via the standard two-loop recursion.

    History rows are kept in CHRONOLOGICAL order (oldest first, newest
    at m-1; updates roll the arrays by one row) so every slice below
    is a static index: the loops unroll into 4m fusable dot/axpy
    streams. The first cut kept a rolling write pointer instead and
    indexed rows with a traced index from inside lax.fori_loop — the
    dynamic-slice gathers + loop sequencing measured 135 ms on TPU v5e
    at D = 11.3M, m = 5, vs low-single-digit ms for the static form.
    Empty slots carry rho == 0 so their axpy contributions vanish
    without any branch.
    """
    g = state["grad"]
    s_hist, y_hist, rho = state["s_hist"], state["y_hist"], state["rho"]

    qv = g
    alpha = [None] * m
    for i in range(m - 1, -1, -1):             # newest -> oldest
        alpha[i] = rho[i] * jnp.dot(s_hist[i], qv)
        qv = qv - alpha[i] * y_hist[i]
    qv = qv * state["gamma"]
    for i in range(m):                         # oldest -> newest
        b = rho[i] * jnp.dot(y_hist[i], qv)
        qv = qv + (alpha[i] - b) * s_hist[i]
    return -qv


# libLBFGS's max_linesearch default — the oracle (tests/oracle_plm.py
# :173) and plmc share it; a step that needs more trials than this
# freezes the fit permanently, so undershooting the reference's budget
# would end fits the reference completes
_MAX_LS = 40


def make_lbfgs_chunk(vg, *, m=5, steps_per_call=1, max_ls=_MAX_LS,
                     conv_tol=1e-5, norm_split=None):
    """Build chunk(x, state, *extra) -> (x, state, metrics).

    vg : (x (D,), *extra) -> (value, grad (D,)) — value and gradient
        of the objective, jit-traceable. ``extra`` (e.g. the MSA codes
        and weights) is threaded through the chunk as arguments rather
        than closed over, so multi-process global arrays stay legal
        jit inputs.
    metrics : (steps_per_call, 4) float32 rows of
        [value, ||grad||, ||x||, ls_failed] at the ACCEPTED iterate of
        each step — the per-iteration record plmc prints to stderr
        (reference couplings/tools.py:20-108 parses these columns from
        the plmc log, where row k holds fx after iteration k's
        update). With norm_split=d, two extra columns
        [||x[d:]||, ||x[:d]||] report the field / coupling norms of
        the iterate (plmc's ||h|| and ||J|| table columns) per step.

    Convergence uses the libLBFGS rule ||g|| <= tol * max(1, ||x||);
    once it trips, remaining steps in the chunk pass through unchanged
    (the host truncates the iteration table at the first converged
    row).
    """

    def step(x, state, extra):
        d = _two_loop_direction(state, m)
        value0, grad0 = state["value"], state["grad"]

        dphi0 = jnp.dot(grad0, d)
        # fall back to steepest descent if the two-loop direction is
        # not a descent direction (possible with stale curvature after
        # skipped history updates)
        bad = dphi0 >= 0
        d = jnp.where(bad, -grad0, d)
        dphi0 = jnp.where(bad, -jnp.dot(grad0, grad0), dphi0)

        # libLBFGS seeds the very first iteration (no history, raw
        # gradient direction) with t = 1/||d||; with history the unit
        # Newton-like step is almost always accepted on trial one.
        # Deliberately keyed on the FIRST ITERATION (count == 0), not
        # on "history empty": a curvature-skipped first update leaves
        # the history empty at count >= 1, and both libLBFGS and the
        # f64 oracle (tests/oracle_plm.py:246-247) take the unit step
        # there too
        dnorm = jnp.sqrt(jnp.dot(d, d))
        t0 = jnp.where(
            state["count"] == 0, 1.0 / jnp.maximum(dnorm, 1e-30), 1.0
        ).astype(x.dtype)

        # Near the optimum at finite precision the Wolfe tests turn
        # into comparisons of rounding noise and the search would
        # thrash to max_ls on every iteration (measured ~10 evals/iter
        # at f32 with loss ~3e5). Guard like libLBFGS: when the full
        # predicted first-order change |t dphi0| is below one ulp of
        # the objective, the step is unresolvable — accept it on plain
        # Armijo; when even Armijo cannot be satisfied there, the
        # search FAILS and the optimization stops at the current point
        # (libLBFGS returns LBFGSERR_ROUNDING_ERROR /
        # _MAXIMUMLINESEARCH there; plmc ends the fit the same way —
        # and max_ls exhaustion stops the fit too, so a thrashing
        # search costs max_ls evals exactly once).
        eps_f = jnp.finfo(x.dtype).eps

        # carry: (t_next, t_eval, value@t_eval, grad@t_eval, ok,
        # done, n). Every pass evaluates at t_next and records it as
        # t_eval, so on exit — acceptance, rounding-failure, or max_ls
        # exhaustion — the triple (t_eval, value, grad) is consistent.
        def cond(c):
            _, _, _, _, _, done, n = c
            return jnp.logical_and(~done, n < max_ls)

        def body(c):
            t, _, _, _, _, _, n = c
            value_t, grad_t = vg(x + t * d, *extra)
            dphi = jnp.dot(grad_t, d)
            armijo = value_t <= value0 + _C1 * t * dphi0
            too_short = dphi < _C2 * dphi0         # still descending hard
            overshoot = dphi > -_C2 * dphi0        # strong-Wolfe far side
            tiny = t * jnp.abs(dphi0) <= eps_f * jnp.abs(value0)
            ok = armijo & (~too_short & ~overshoot | tiny)
            fail = tiny & ~armijo
            # (no ok-override needed on t_next: ok implies done, so
            # the while_loop exits before slot 0 is read again — the
            # accepted step is read from slot 1, t_eval)
            t_next = jnp.where(
                ~armijo | overshoot, t * _SHRINK,
                jnp.where(too_short, t * _GROW, t),
            )
            return t_next, t, value_t, grad_t, ok, ok | fail, n + 1

        _, t, value_t, grad_t, ok, _, n_ls = lax.while_loop(
            cond, body,
            (t0, t0, value0, grad0, jnp.zeros((), bool),
             jnp.zeros((), bool), jnp.zeros((), jnp.int32)),
        )

        # rounding failure or max_ls exhaustion: do not move, freeze
        # the fit (the scan wrapper's converged flag passes every
        # remaining step through unchanged)
        t = jnp.where(ok, t, 0.0)
        value_t = jnp.where(ok, value_t, value0)
        grad_t = jnp.where(ok, grad_t, grad0)

        x_new = x + t * d

        s = t * d
        y = grad_t - grad0
        sy = jnp.dot(s, y)
        accept = ok & (sy > _MIN_CURVATURE)
        f = x.dtype
        # chronological roll: drop the oldest row, append the new pair
        # (one extra (m, D) rewrite, ~1 ms at D = 11.3M — the price of
        # static indices in the two-loop above). On a skipped update
        # the roll writes back the unchanged history.
        s_hist = jnp.where(
            accept,
            jnp.concatenate([state["s_hist"][1:], s[None]], axis=0),
            state["s_hist"],
        )
        y_hist = jnp.where(
            accept,
            jnp.concatenate([state["y_hist"][1:], y[None]], axis=0),
            state["y_hist"],
        )
        rho_new = jnp.where(
            accept, 1.0 / jnp.maximum(sy, _MIN_CURVATURE), 0.0
        ).astype(f)
        rho = jnp.where(
            accept,
            jnp.concatenate([state["rho"][1:], rho_new[None]]),
            state["rho"],
        )
        gamma = jnp.where(
            accept, sy / jnp.maximum(jnp.dot(y, y), 1e-30),
            state["gamma"],
        ).astype(f)
        new_state = {
            "s_hist": s_hist,
            "y_hist": y_hist,
            "rho": rho,
            "gamma": gamma,
            # a linesearch-failed step does not move x and is not an
            # accepted iteration (the fit freezes after it anyway)
            "count": state["count"] + ok.astype(jnp.int32),
            "nevals": state["nevals"] + n_ls,
            "value": value_t.astype(f),
            "grad": grad_t.astype(f),
            "converged": state["converged"],
            "ls_failed": state["ls_failed"] | ~ok,
        }
        return x_new, new_state

    def chunk(x, state, *extra):
        def _norms(x, state):
            return (
                jnp.sqrt(jnp.dot(state["grad"], state["grad"])),
                jnp.sqrt(jnp.dot(x, x)),
            )

        def scan_body(carry, _):
            x, state, gnorm, xnorm = carry
            conv = gnorm <= conv_tol * jnp.maximum(1.0, xnorm)
            state_in = dict(state, converged=state["converged"] | conv)

            x2, state2 = lax.cond(
                state_in["converged"] | state_in["ls_failed"],
                lambda op: op,
                lambda op: step(*op, extra),
                (x, state_in),
            )
            # the record reports the ACCEPTED new iterate (plmc's
            # iteration log prints fx at the post-step point); on a
            # frozen pass-through it repeats the current point. The
            # 4th column flags a linesearch failure so the host can
            # truncate the table at the failing step.
            gnorm2, xnorm2 = _norms(x2, state2)
            # fold convergence at the POST-step iterate too: without
            # this, a chunk whose LAST step converges returns
            # converged=False and the host dispatches one more chunk
            # of frozen pass-throughs (recorded as duplicate rows).
            # Bitwise no-op on the trajectory — the next step's
            # pre-step fold would reach the same verdict from the
            # same carried gradient
            conv2 = gnorm2 <= conv_tol * jnp.maximum(1.0, xnorm2)
            state2 = dict(state2, converged=state2["converged"] | conv2)
            cols = [
                state2["value"].astype(jnp.float32),
                gnorm2.astype(jnp.float32),
                xnorm2.astype(jnp.float32),
                state2["ls_failed"].astype(jnp.float32),
            ]
            if norm_split is not None:
                cols.append(jnp.sqrt(
                    jnp.dot(x2[norm_split:], x2[norm_split:])
                ).astype(jnp.float32))
                cols.append(jnp.sqrt(
                    jnp.dot(x2[:norm_split], x2[:norm_split])
                ).astype(jnp.float32))
            rec = jnp.stack(cols)
            return (x2, state2, gnorm2, xnorm2), rec

        gnorm0, xnorm0 = _norms(x, state)
        (x, state, _, _), metrics = lax.scan(
            scan_body, (x, state, gnorm0, xnorm0), None,
            length=steps_per_call,
        )
        return x, state, metrics

    return chunk
