"""On-device objective evaluators for the three network-optimization tasks.

These score generated solutions and are used by eval metrics, baselines
(GD/PPO rewards), and trajectory analysis.  All are batched, jit/vmap-safe,
static-shape JAX — the reference's NU evaluator is a Python double loop
(``classifier_free_NU.py:279-303``) which here becomes a sort + exclusive
cumulative sum over the SIC order.

Reference sources:
  * MSR sum-rate: ``classifier_free_MSR.py:287-288``
  * CO cost with offload redistribution: ``classifier_free_CO.py:255-278``
  * NU NOMA-SIC rate: ``classifier_free_NU.py:279-303``
"""

from __future__ import annotations

import jax.numpy as jnp

LOG2 = jnp.log(2.0)

# --- MSR: maximum sum rate over M channels ----------------------------------


def msr_sum_rate(p: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Per-sample rate ``sum_m log2(1 + p_m * g_m)``.

    p: (B, M) power allocation, g: (B, M) channel gains.  Returns (B,).
    """
    return jnp.sum(jnp.log2(1.0 + p * g), axis=1)


# --- CO: computation offloading cost -----------------------------------------


def co_cost(X: jnp.ndarray, Y: jnp.ndarray, decision_threshold: float = 0.1) -> jnp.ndarray:
    """Overall offloading cost per sample (``classifier_free_CO.py:255-278``).

    X: (B, 3N) derived features, interleaved per node as
       [local_cost, offload_transition_cost, ideal_offload_exec_cost].
    Y: (B, N) resource-allocation shares.

    Semantics reproduced from the reference:
      * offload decision D = (Y > 0.1);
      * non-offloaded shares zeroed, then the residual ``(1 - sum Y)`` is
        redistributed **equally across offloaded nodes** (``:264-270``);
        all-local rows get D_sum replaced by 1e-5 to avoid 0/0;
      * non-offloaded nodes get share 1e-5 (harmless: multiplied by D=0);
      * cost = sum_i (1-D_i)*local_i + D_i*(transition_i + exec_i / Y_i).

    The reference hard-codes the 3-node broadcast of the redistribution term
    (``torch.cat((Y_diff,)*3)``); here it broadcasts to any N.
    """
    D = (Y > decision_threshold).astype(Y.dtype)
    Yz = Y * D
    Y_sum = jnp.sum(Yz, axis=1)
    D_sum = jnp.sum(D, axis=1)
    D_sum = jnp.where(D_sum == 0, 1e-5, D_sum)
    Y_diff = ((1.0 - Y_sum) / D_sum)[:, None]
    Yr = jnp.where(D == 1, Yz + Y_diff, 1e-5)

    local = X[:, 0::3]
    transition = X[:, 1::3]
    execution = X[:, 2::3]
    return jnp.sum((1.0 - D) * local + D * (transition + execution / Yr), axis=1)


# --- NU: NOMA-UAV sum rate ----------------------------------------------------

NU_SIGMA_SQ = 110.0
NU_RHO_0 = 60.0
NU_UAV_H = 150.0


def nu_channel_gains(uav_xy: jnp.ndarray, user_xy: jnp.ndarray) -> jnp.ndarray:
    """h_j = sqrt(rho0 / (H^2 + ||q_user_j - q_uav||^2)).

    uav_xy: (B, 2); user_xy: (B, 2K) interleaved [x1,y1,x2,y2,...].
    Returns (B, K).
    """
    dx = user_xy[:, 0::2] - uav_xy[:, 0:1]
    dy = user_xy[:, 1::2] - uav_xy[:, 1:2]
    return jnp.sqrt(NU_RHO_0 / (NU_UAV_H**2 + dx**2 + dy**2))


def nu_rate(Y: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """NOMA sum rate with SIC decoding order by descending channel gain.

    Y: (B, 2+K) decoded solutions [uav_x, uav_y, P_1..P_K] (unnormalized).
    X: (B, 2K) user coordinates (unnormalized).  Returns rates (B,).

    The reference computes, per row (``classifier_free_NU.py:293-301``):
      * strongest-channel user j0: sinr = P_j0 * h_j0^2 / sigma^2
      * user at SIC position k>0: sinr = P_j / (sum of P over users at
        positions < k  +  sigma^2 / h_j^2)
    Here: sort channels descending, exclusive-cumsum the sorted powers, and
    evaluate in sorted order (the final sum over users is order-invariant).
    """
    P = Y[:, 2:]
    h = nu_channel_gains(Y[:, :2], X)

    order = jnp.argsort(-h, axis=1)                      # (B, K) SIC order
    h_sorted = jnp.take_along_axis(h, order, axis=1)
    P_sorted = jnp.take_along_axis(P, order, axis=1)

    interference = jnp.cumsum(P_sorted, axis=1) - P_sorted  # exclusive prefix sum
    sinr_strong = P_sorted * h_sorted**2 / NU_SIGMA_SQ
    sinr_rest = P_sorted / (interference + NU_SIGMA_SQ / h_sorted**2)
    k_pos = jnp.arange(P.shape[1])[None, :]
    sinr_sorted = jnp.where(k_pos == 0, sinr_strong, sinr_rest)
    return jnp.sum(jnp.log2(1.0 + sinr_sorted), axis=1)
