"""Experimental/legacy loss zoo (``utils/loss_function.py`` in the reference).

These losses are not used by the shipped CFG training path (which is pure
epsilon-MSE) but document the repo's earlier constrained-optimization
experiments: classification-augmented CO losses, a VAE loss (the VAE model
itself never shipped), a Lagrangian diffusion loss on the implied y_{t-1},
and direct objective losses.  Ported as pure JAX for capability parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def class_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """MSE + XOR decision-classification loss + sum constraint
    (``loss_function.py:4-19``)."""
    mse = jnp.mean((y_true - y_pred) ** 2, axis=-1)
    true_d = (y_true >= 0.1).astype(jnp.int32)
    pred_d = (y_pred >= 0.1).astype(jnp.int32)
    cls = jnp.sum(true_d ^ pred_d, axis=-1) * 0.01
    sum_constraint = (jnp.sum(y_pred, axis=-1) - jnp.sum(y_true, axis=-1)) ** 2
    return jnp.sum(mse + cls + sum_constraint, axis=0)


def custom_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """MSE + sum constraint (``loss_function.py:21-31``)."""
    mse = jnp.mean((y_true - y_pred) ** 2, axis=-1)
    sum_constraint = (jnp.sum(y_pred, axis=-1) - jnp.sum(y_true, axis=-1)) ** 2
    return jnp.sum(mse + sum_constraint)


def vae_loss(y, y_hat, mean, logvar, kld_weight: float) -> jnp.ndarray:
    """Reconstruction + KLD (``loss_function.py:33-42``)."""
    rec = jnp.mean((y_hat - y) ** 2)
    kld = jnp.mean(-0.5 * jnp.sum(1 + logvar - mean**2 - jnp.exp(logvar), axis=1))
    return rec + kld * kld_weight


def convention_co_opt_loss(y0: jnp.ndarray, x0: jnp.ndarray,
                           lambda0: float = 1.0) -> jnp.ndarray:
    """Direct CO objective loss on standardized+softmaxed allocations with
    the exp(y-0.1) soft decision (``loss_function.py:131-175``).
    Note: torch.std is unbiased — reproduced with ddof=1."""
    y = 0.5 * (y0 - jnp.mean(y0)) / jnp.std(y0, ddof=1) + 0.5
    y = jax.nn.softmax(y, axis=1)
    local = x0[:, 0::3]
    transition = x0[:, 1::3]
    execution = x0[:, 2::3]
    soft_d = jnp.exp(y - 0.1)
    cost = jnp.sum(soft_d * local + soft_d * (transition + execution / y), axis=1)
    return jnp.sum(lambda0 * cost)


def sum_rate_loss(p0: jnp.ndarray, g0: jnp.ndarray, W: float = 10.0) -> jnp.ndarray:
    """Constraint + no-zero + negative-rate loss (``loss_function.py:177-204``)."""
    p = (p0 - jnp.min(p0)) / (jnp.max(p0) - jnp.min(p0)) * (W - 0.1) + 0.1
    constrain = (jnp.sum(p, axis=1) - W) ** 2
    no_zero = jnp.sum(1.0 / jnp.exp(p))
    r = jnp.sum(jnp.log2(1.0 + p * g0[:, : p.shape[1]]), axis=1)
    return jnp.sum(constrain) + no_zero + jnp.sum(-r)


def diffusion_opt_loss(estimated_noise, noise, y_t, x0, alphas, t,
                       lambdas=(0.001, 0.05, 0.05, 0.05, 0.1)) -> jnp.ndarray:
    """Epsilon-MSE + Lagrangian optimization loss on the implied y_{t-1}
    (``loss_function.py:44-129``), for the legacy 7-feature CO format
    ``[s, c, w, theta, f_l, h, alpha] x N + [F_t, kappa, P_t, P_I, B, N0]``.
    """
    pre_loss = jnp.mean((estimated_noise - noise) ** 2)

    acp = jnp.cumprod(alphas)
    a_t = acp[t][:, None]
    a_t1 = acp[jnp.maximum(t - 1, 0)][:, None]
    alpha_t = alphas[t][:, None]
    y_t1 = (y_t - (1.0 - alpha_t) / jnp.sqrt(1.0 - a_t1) * estimated_noise) \
        / jnp.sqrt(alpha_t) + (1.0 - a_t1) / (1.0 - a_t) * noise

    F_t, kappa, P_t, P_I = x0[0, -6], x0[0, -5], x0[0, -4], x0[0, -3]
    B, N0 = x0[0, -2], x0[0, -1]
    feat = x0[:, :-6]
    s, c, w = feat[:, 0::7], feat[:, 1::7], feat[:, 2::7]
    theta, f_l, h, alpha = feat[:, 3::7], feat[:, 4::7], feat[:, 5::7], feat[:, 6::7]

    sinr = P_t * h**2 / (N0 + jnp.sum(P_t * h**2))
    r_u = B * jnp.log2(1 + sinr)
    beta = 1.0 - alpha

    def total_cost(y, D):
        tau = jnp.where(D == 1, alpha * (s / r_u + c / (F_t * y) + w / r_u),
                        alpha * c / f_l)
        eps = jnp.where(D == 1, beta * (P_t * s / r_u + P_I * c / (F_t * y) + P_t * w / r_u),
                        beta * kappa * f_l**2 * c)
        return jnp.sum(tau + eps, axis=1)

    D_t = (y_t > 0.05).astype(y_t.dtype)
    D_t1 = (y_t1 > 0.05).astype(y_t.dtype)
    cost_diff = jnp.maximum(total_cost(y_t1, D_t1) - total_cost(y_t, D_t), 0.0)

    delays = jnp.where(D_t1 == 1, s / r_u + c / (F_t * y_t1) + w / r_u, c / f_l)
    g2 = jnp.sum(jnp.maximum(delays - theta, 0.0), axis=1)
    g3 = jnp.sum(jnp.maximum(y_t1 - 1.0, 0.0), axis=1)
    g4 = jnp.sum(jnp.maximum(-y_t1, 0.0), axis=1)
    g5 = jnp.maximum(jnp.sum(y_t1, axis=1) - 1.0, 0.0)

    opt = (lambdas[0] * cost_diff + lambdas[1] * g2 + lambdas[2] * g3
           + lambdas[3] * g4 + lambdas[4] * g5)
    return 0.5 * jnp.sum(pre_loss) + 0.5 * jnp.sum(opt)
