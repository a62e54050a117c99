"""Gradient-descent baseline — vectorized, jitted JAX ports.

The reference (``baselines/GD.py``) runs hand-derived gradient iterations in
NumPy per task, then applies a feasibility projection.  Same math here, but
each solver is one jitted ``lax.fori_loop`` over the fixed iteration count,
fully batched — on TPU the whole solve is a single device program.

Per-task specifics (reference line refs):
  * CO  (``GD.py:12-59``): joint decision+allocation vector of size 2N,
    Lagrange-ish penalty terms, 100 iters, step 0.1, then per-row min-max
    normalization of the allocation block before costing.
  * MSR (``GD.py:62-97``): ascent on rates with a sum-constraint barrier
    term, 100 iters, step 1e-3, then residual redistribution to sum W.
  * NU  (``GD.py:100-157``): hand-derived K=3 gradient (kept K=3 like the
    reference), 100 iters, step 0.1, powers rescaled to sum P_sum.
    NOTE: the reference feeds the loader-NORMALIZED coordinates (in [0, 1])
    to the gradient while initializing the UAV at (width/2, height/2) —
    dimensionally odd, but reproduced for comparable baseline numbers
    (``GD.py:123,131``); pass ``coords_norm`` accordingly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

LOG2 = jnp.log(2.0)


# --- CO -----------------------------------------------------------------------


def _co_gradient(x, y, node_num: int, lambda1: float, lambda2: float):
    """Reference ``co_gradient`` (GD.py:12-21): y holds [D_1..D_N, R_1..R_N]."""
    D, R = y[:, :node_num], y[:, node_num:]
    local = x[:, 0::3]
    transition = x[:, 1::3]
    execution = x[:, 2::3]
    gD = -local + transition + execution / R + (1 - 2 * D) * lambda1
    gR = -execution / (R**2) * D + (jnp.sum(R, axis=1, keepdims=True) * 2 - 1) * lambda2
    return jnp.concatenate([gD, gR], axis=1)


@partial(jax.jit, static_argnames=("node_num", "iterations"))
def co_gd_solve(X_unnorm, node_num: int = 3, iterations: int = 100,
                step: float = 0.1, lambda1: float = 1.0, lambda2: float = 1.0):
    """Returns allocation shares (B, N), min-max normalized per row
    (the reference's post-hoc projection, GD.py:43-45)."""
    B = X_unnorm.shape[0]
    y0 = jnp.ones((B, 2 * node_num), X_unnorm.dtype)
    y0 = y0.at[:, node_num:].set(1.0 / node_num)

    def body(_, y):
        return y - step * _co_gradient(X_unnorm, y, node_num, lambda1, lambda2)

    y = jax.lax.fori_loop(0, iterations, body, y0)
    R = y[:, node_num:]
    mn = jnp.min(R, axis=1, keepdims=True)
    mx = jnp.max(R, axis=1, keepdims=True)
    return (R - mn) / (mx - mn)


# --- MSR ----------------------------------------------------------------------


def _msr_gradient(g, p):
    """Reference ``msr_gradient`` (GD.py:62-70)."""
    product = g * p
    barrier = 1.0 / ((jnp.sum(p, axis=1, keepdims=True) - 1.0) ** 2)
    return g / ((product + 1.0) * LOG2) - barrier


@partial(jax.jit, static_argnames=("iterations",))
def msr_gd_solve(g_unnorm, W: float, iterations: int = 100, step: float = 1e-3):
    """Gradient ascent + residual redistribution to sum exactly W (GD.py:72-87)."""
    M = g_unnorm.shape[1]
    p = jnp.full_like(g_unnorm, W / M)

    def body(_, p):
        return p + step * _msr_gradient(g_unnorm, p)

    p = jax.lax.fori_loop(0, iterations, body, p)
    residual = (W - jnp.sum(p, axis=1, keepdims=True)) / M
    return p + residual


# --- NU -----------------------------------------------------------------------


def _nu_gradient(y, coords, P_sum: float):
    """Reference ``nu_gradient`` (GD.py:100-117), K=3 hard-coded like the
    reference (distance terms d1/d2/d3 and the 22500 = H^2 constant)."""
    d_sq = [
        (y[:, 0] - coords[:, 2 * i]) ** 2 + (y[:, 1] - coords[:, 2 * i + 1]) ** 2
        for i in range(3)
    ]
    d_total = d_sq[0] + d_sq[1] + d_sq[2]
    gx = jnp.zeros_like(y[:, 0])
    gy = jnp.zeros_like(y[:, 1])
    gp = []
    for i in range(3):
        tmp = 6 + 11 / 6 * (22500 + d_sq[i])
        common = y[:, 2 + i] * 11 / 3 / (tmp**2) / (1 + y[:, 2 + i] / tmp) / jnp.log(2.0)
        gx = gx - common * (y[:, 0] - coords[:, 2 * i]) \
            + 2 * (coords[:, 2 * i + 1] - y[:, 0]) / (d_total**2)
        gy = gy - common * (y[:, 1] - coords[:, 2 * i + 1]) \
            + 2 * (coords[:, 2 * i + 1] - y[:, 1]) / (d_total**2)
        gp.append(
            -1 / tmp / (1 + y[:, 2 + i] / tmp) / jnp.log(2.0)
            + 1 / ((jnp.sum(y[:, 2:], axis=1) - P_sum) ** 2)
        )
    return jnp.stack([gx, gy] + gp, axis=1)


@partial(jax.jit, static_argnames=("iterations",))
def nu_gd_solve(coords_norm, P_sum: float = 18.0, width: float = 400.0,
                height: float = 400.0, iterations: int = 100, step: float = 0.1):
    """Returns (B, 5) [uav_x, uav_y, P1..P3]; powers rescaled to sum P_sum
    (GD.py:120-145).  ``coords_norm`` are the loader-normalized user
    coordinates, exactly what the reference passes (GD.py:123,131)."""
    B = coords_norm.shape[0]
    K = 3
    y0 = jnp.full((B, 2 + K), P_sum / K - 0.01, coords_norm.dtype)
    y0 = y0.at[:, 0].set(width / 2).at[:, 1].set(height / 2)

    def body(_, y):
        return y + step * _nu_gradient(y, coords_norm, P_sum)

    y = jax.lax.fori_loop(0, iterations, body, y0)
    P = y[:, 2:]
    P = P / jnp.sum(P, axis=1, keepdims=True) * P_sum
    return jnp.concatenate([y[:, :2], P], axis=1)
