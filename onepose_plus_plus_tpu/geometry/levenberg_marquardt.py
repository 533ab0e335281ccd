"""Batched Levenberg-Marquardt solvers (JAX) — the DeepLM replacement.

The reference refines SfM geometry with the external C++/CUDA DeepLM solver
(``submodules/DeepLM``, invoked at reference
``src/KeypointFreeSfM/post_optimization/optimizer/optimizer.py:204-219``) with
an Adam fallback (``first_order_solver.py:6-172``). Its only production
configuration optimizes **one scalar depth per track with poses constant**
(``optimize_procedure=["depth"]``, SURVEY.md §2.2) — i.e. the global sparse
problem factors into thousands of independent tiny nonlinear least squares.

TPU-native design: a vmapped small-dimension LM with exact Jacobians from
``jax.jacfwd`` and a ``lax.while_loop`` trust-region iteration. One device pass
refines every track simultaneously — no sparse-matrix machinery, no host
round-trips. ``lm_solve_scalar`` specializes d=1 (pure VPU arithmetic, no
linear solves). A first-order Adam path mirrors the reference fallback for
parity experiments.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

_EPS = 1e-12


class LMState(NamedTuple):
    x: jnp.ndarray
    cost: jnp.ndarray
    lam: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray


def _lm_single(
    residual_fn: Callable,
    x0: jnp.ndarray,
    args,
    max_iters: int,
    lam0: float,
    rel_tol: float,
):
    """LM on one problem: x0 [D], residual_fn(x, *args) -> [R]."""

    def cost_of(x):
        r = residual_fn(x, *args)
        return 0.5 * jnp.sum(r * r)

    def cond(s: LMState):
        return (~s.done) & (s.it < max_iters)

    def step(s: LMState):
        r = residual_fn(s.x, *args)
        J = jax.jacfwd(residual_fn)(s.x, *args)  # [R, D]
        JtJ = J.T @ J
        g = J.T @ r
        d = x0.shape[0]
        A = JtJ + s.lam * jnp.diag(jnp.maximum(jnp.diag(JtJ), _EPS))
        delta = -jnp.linalg.solve(A + 1e-12 * jnp.eye(d, dtype=A.dtype), g)
        x_new = s.x + delta
        new_cost = cost_of(x_new)
        improved = new_cost < s.cost
        x_out = jnp.where(improved, x_new, s.x)
        cost_out = jnp.where(improved, new_cost, s.cost)
        lam_out = jnp.where(improved, s.lam * 0.33, s.lam * 3.0)
        lam_out = jnp.clip(lam_out, 1e-10, 1e10)
        rel = jnp.abs(s.cost - cost_out) / (s.cost + _EPS)
        done = improved & (rel < rel_tol)
        return LMState(x_out, cost_out, lam_out, s.it + 1, done)

    init = LMState(
        x=x0,
        cost=cost_of(x0),
        lam=jnp.asarray(lam0, x0.dtype),
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
    )
    out = jax.lax.while_loop(cond, step, init)
    return out.x, out.cost


@partial(jax.jit, static_argnames=("residual_fn", "max_iters"))
def lm_solve(
    residual_fn: Callable,
    x0: jnp.ndarray,
    args=(),
    max_iters: int = 20,
    lam0: float = 1e-3,
    rel_tol: float = 1e-6,
):
    """Batched LM: solve B independent problems in one vmapped pass.

    Args:
        residual_fn: (x [D], *per_problem_args) -> residuals [R]. Must be
            jit-traceable with static shapes.
        x0: [B, D] initial parameters.
        args: tuple of arrays with leading batch dim B, passed per problem.
    Returns:
        (x [B, D], cost [B]) final parameters and 0.5*||r||^2.
    """
    return jax.vmap(
        lambda x, *a: _lm_single(residual_fn, x, a, max_iters, lam0, rel_tol)
    )(x0, *args)


def _lm_scalar_batch(
    residual_fn: Callable,
    x0: jnp.ndarray,
    args,
    max_iters: int,
    lam0: float,
    rel_tol: float,
):
    """All-batch scalar LM without per-problem while_loops.

    For d=1 the LM update is elementwise: delta = -J.r / (J.J (1+lam)).
    Running every problem for the same fixed iteration count keeps one fused
    XLA loop (better than B divergent while_loops on TPU); converged problems
    freeze via their `done` flag.
    """

    def cost_of(x):  # x [B]
        r = jax.vmap(lambda xi, *a: residual_fn(xi, *a))(x, *args)  # [B, R]
        return 0.5 * jnp.sum(r * r, axis=-1)

    def r_and_j(x):
        def single(xi, *a):
            r = residual_fn(xi, *a)
            j = jax.jacfwd(residual_fn)(xi, *a)
            return r, j

        return jax.vmap(single)(x, *args)  # [B, R], [B, R] (d=1 squeezed)

    def body(carry, _):
        x, cost, lam, done = carry
        r, J = r_and_j(x)
        J = J.reshape(r.shape)  # [B, R]
        jtj = jnp.sum(J * J, axis=-1)  # [B]
        g = jnp.sum(J * r, axis=-1)
        delta = -g / (jtj * (1.0 + lam) + _EPS)
        x_new = x + delta
        new_cost = cost_of(x_new)
        improved = (new_cost < cost) & ~done
        x = jnp.where(improved, x_new, x)
        rel = jnp.abs(cost - new_cost) / (cost + _EPS)
        cost = jnp.where(improved, new_cost, cost)
        lam = jnp.clip(
            jnp.where(improved, lam * 0.33, lam * 3.0), 1e-10, 1e10
        )
        done = done | (improved & (rel < rel_tol))
        return (x, cost, lam, done), None

    cost0 = cost_of(x0)
    lam = jnp.full_like(x0, lam0)
    done = jnp.zeros_like(x0, dtype=bool)
    (x, cost, _, _), _ = jax.lax.scan(
        body, (x0, cost0, lam, done), None, length=max_iters
    )
    return x, cost


@partial(jax.jit, static_argnames=("residual_fn", "max_iters"))
def lm_solve_scalar(
    residual_fn: Callable,
    x0: jnp.ndarray,
    args=(),
    max_iters: int = 20,
    lam0: float = 1e-3,
    rel_tol: float = 1e-6,
):
    """Batched scalar (d=1) LM: x0 [B], residual_fn(x_scalar, *args) -> [R]."""
    return _lm_scalar_batch(residual_fn, x0, args, max_iters, lam0, rel_tol)


@partial(jax.jit, static_argnames=("residual_fn", "max_iters"))
def first_order_solve(
    residual_fn: Callable,
    x0: jnp.ndarray,
    args=(),
    lr: float = 3e-2,
    max_iters: int = 1000,
    early_stop_rel: float = 1e-4,
    early_stop_after_frac: float = 0.2,
):
    """Adam on 0.5*||r||^2, batched — mirror of reference ``FirstOrderSolve``
    (``first_order_solver.py:6-172``: lr 3e-2, <=1000 steps, early stop when
    relative decrease < 0.01% after 20% of the budget).

    Runs the full fixed iteration count with converged entries frozen (XLA
    needs static trip counts; the freeze reproduces early stopping).
    """

    def cost_of(x):
        r = jax.vmap(lambda xi, *a: residual_fn(xi, *a))(x, *args)
        return 0.5 * jnp.sum(r * r, axis=-1)

    opt = optax.adam(lr)

    def total(x):
        return jnp.sum(cost_of(x))

    grad_fn = jax.grad(total)
    min_iter = int(max_iters * early_stop_after_frac)

    def body(carry, it):
        x, opt_state, prev_total, done = carry
        g = grad_fn(x)
        updates, opt_state = opt.update(g, opt_state, x)
        x_new = optax.apply_updates(x, updates)
        new_total = jnp.sum(cost_of(x_new))
        # global early stop on the summed loss, as the reference does
        # (first_order_solver.py:138-140); all problems freeze together.
        rel = jnp.abs(prev_total - new_total) / (prev_total + _EPS)
        newly_done = (it >= min_iter) & (rel < early_stop_rel)
        x = jnp.where(done, x, x_new)
        total = jnp.where(done, prev_total, new_total)
        return (x, opt_state, total, done | newly_done), None

    total0 = jnp.sum(cost_of(x0))
    (x, _, _, _), _ = jax.lax.scan(
        body,
        (x0, opt.init(x0), total0, jnp.asarray(False)),
        jnp.arange(max_iters),
    )
    return x, cost_of(x)
