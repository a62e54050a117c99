"""PPO baseline: one-step contextual-bandit PPO (reference ``baselines/PPO.py``).

The "environment" is stateless — a reward shaped from the task objective:
``reward = 1 / (|obj(action) - obj(ground_truth)| + eps)``
(``PPO.py:89-100,216-228,347-361``).  Advantage uses the reference's
constant-bootstrap ``returns = r + gamma * 3.8`` (``PPO.py:73-80``) and the
clipped surrogate with epsilon 0.2 (``:82-86``).

Architecture (``PPO.py:33-70``): critic and actor are 4-Linear Tanh trunks
(state -> 64 -> 16 -> 32 -> out), orthogonal init (std sqrt(2), final layer
1.0 / 0.01, zero bias), plus a learned ``log_std`` parameter.  Quirk
reproduced: the reference's two optimizers cover only ``agent.actor`` and
``agent.critic`` parameters — ``log_std`` is never optimized and stays 0
(std = 1).

Layer names are the torch Sequential indices (0, 2, 4, 6) so the shipped
``ppo_*.pt`` checkpoints convert 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as nn

from ..train.trainer import multistep_lr
from ..utils.torch_import import load_torch_state_dict


class _Trunk(nn.Module):
    """Linear-Tanh x3 -> Linear, names = torch Sequential indices."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        for i, f in zip((0, 2, 4), (64, 16, 32)):
            x = jnp.tanh(nn.Dense(f, name=str(i))(x))
        return nn.Dense(self.out_dim, name="6")(x)


class PPOAgent(nn.Module):
    state_dim: int
    action_dim: int

    def setup(self):
        self.critic = _Trunk(1)
        self.actor = _Trunk(self.action_dim)
        self.log_std = self.param(
            "log_std", lambda k: jnp.zeros((1, self.action_dim), jnp.float32)
        )

    def __call__(self, state):
        """Returns (value (B,1), mu (B,A), std (1,A))."""
        return self.critic(state), self.actor(state), jnp.exp(self.log_std)


def orthogonal_ppo_init(agent: PPOAgent, key: jax.Array):
    """Reference layer_init (``PPO.py:28-31``): orthogonal weights with
    std sqrt(2) (1.0 for critic head, 0.01 for actor head), zero biases."""
    params = agent.init(key, jnp.zeros((1, agent.state_dim)))["params"]
    k = key
    for trunk, head_std in (("critic", 1.0), ("actor", 0.01)):
        for name in ("0", "2", "4", "6"):
            k, sub = jax.random.split(k)
            std = head_std if name == "6" else float(np.sqrt(2))
            kern = params[trunk][name]["kernel"]
            # torch orthogonal_ operates on (out, in); transpose to match.
            w = jax.nn.initializers.orthogonal(scale=std)(sub, kern.shape[::-1], jnp.float32)
            params[trunk][name]["kernel"] = w.T
            params[trunk][name]["bias"] = jnp.zeros_like(params[trunk][name]["bias"])
    return params


def load_ppo_ckpt(path: str):
    """Convert a reference ppo_*.pt into flax params."""
    sd = load_torch_state_dict(path)
    params = {"log_std": sd["log_std"].astype(np.float32)}
    for trunk in ("critic", "actor"):
        params[trunk] = {
            name: {
                "kernel": sd[f"{trunk}.{name}.weight"].astype(np.float32).T,
                "bias": sd[f"{trunk}.{name}.bias"].astype(np.float32),
            }
            for name in ("0", "2", "4", "6")
        }
    return params


def normal_log_prob(x, mu, std):
    """Elementwise Normal log-density (torch.distributions.Normal.log_prob)."""
    var = std**2
    return -((x - mu) ** 2) / (2 * var) - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi)


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    epochs: int = 200
    batch_size: int = 512
    lr: float = 5e-3
    milestones: Sequence[int] = (20, 100)
    gamma: float = 0.99
    bootstrap: float = 3.8
    clip_eps: float = 0.2
    seed: int = 0


def train_ppo(
    agent: PPOAgent,
    X_train: np.ndarray,
    Y_train: np.ndarray,
    env_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
    action_transform: Callable[[jnp.ndarray], jnp.ndarray],
    cfg: PPOConfig = PPOConfig(),
    log_fn: Callable[[str], None] = print,
    log_every: int = 20,
) -> Tuple[dict, dict]:
    """Contextual-bandit PPO training (reference ``ppo_co`` et al.).

    env_fn(x, decoded_action, y_true) -> rewards (B,).
    action_transform(raw_action) -> decoded action fed to env_fn.
    Returns (params, info).
    """
    key = jax.random.PRNGKey(cfg.seed)
    k_init, key = jax.random.split(key)
    params = orthogonal_ppo_init(agent, k_init)

    B = min(cfg.batch_size, X_train.shape[0])
    steps = max(X_train.shape[0] // B, 1)
    # the carried next-epoch dataset has exactly steps*B rows; trim upfront
    # so every epoch permutes over the true row count (a larger n would make
    # JAX clamp out-of-range gather indices and silently oversample rows)
    n = steps * B
    X_train = X_train[:n]
    Y_train = Y_train[:n]
    actor_opt = optax.adam(multistep_lr(cfg.lr, cfg.milestones, steps))
    critic_opt = optax.adam(multistep_lr(cfg.lr, cfg.milestones, steps))
    # masked updates: actor optimizer touches actor/* only, critic critic/*;
    # log_std is deliberately left unoptimized (reference quirk).
    actor_state = actor_opt.init(params["actor"])
    critic_state = critic_opt.init(params["critic"])

    X = jnp.asarray(X_train, jnp.float32)
    Y = jnp.asarray(Y_train, jnp.float32)

    # initial old_log_prob from Normal(0.5, 0.2) samples (PPO.py:126-132)
    k0, key = jax.random.split(key)
    a0 = 0.5 + 0.2 * jax.random.normal(k0, Y.shape)
    old_lp = normal_log_prob(a0, 0.5, 0.2)

    def batch_update(params, actor_state, critic_state, xb, yb, old_lp_b, k):
        value, mu, std = agent.apply({"params": params}, xb)
        actions = mu + std * jax.random.normal(k, mu.shape)
        new_lp = normal_log_prob(actions, mu, std)
        decoded = action_transform(actions)
        rewards = env_fn(xb, decoded, yb)
        returns = (rewards + cfg.gamma * cfg.bootstrap)[:, None]

        def actor_loss_fn(actor_params):
            p = dict(params, actor=actor_params)
            v, mu2, std2 = agent.apply({"params": p}, xb)
            lp = normal_log_prob(actions, mu2, std2)
            ratio = jnp.exp(lp - old_lp_b)
            adv = returns - value  # value detached (reference: critic output)
            unclipped = ratio * adv
            clipped = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv
            return -jnp.mean(jnp.minimum(unclipped, clipped))

        def critic_loss_fn(critic_params):
            p = dict(params, critic=critic_params)
            v, _, _ = agent.apply({"params": p}, xb)
            return jnp.mean((v - returns) ** 2)

        a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(params["actor"])
        c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(params["critic"])
        a_updates, actor_state = actor_opt.update(a_grads, actor_state)
        c_updates, critic_state = critic_opt.update(c_grads, critic_state)
        params = dict(
            params,
            actor=optax.apply_updates(params["actor"], a_updates),
            critic=optax.apply_updates(params["critic"], c_updates),
        )
        return params, actor_state, critic_state, new_lp, a_loss, c_loss, jnp.mean(rewards)

    @jax.jit
    def epoch_fn(params, actor_state, critic_state, X, Y, old_lp, key):
        k_perm, k_steps = jax.random.split(key)
        perm = jax.random.permutation(k_perm, n)[: steps * B]
        Xs = X[perm].reshape(steps, B, -1)
        Ys = Y[perm].reshape(steps, B, -1)
        Ls = old_lp[perm].reshape(steps, B, -1)
        ks = jax.random.split(k_steps, steps)

        def body(carry, inp):
            params, a_st, c_st = carry
            xb, yb, lb, k = inp
            params, a_st, c_st, new_lp, al, cl, rw = batch_update(
                params, a_st, c_st, xb, yb, lb, k
            )
            return (params, a_st, c_st), (new_lp, al, cl, rw)

        (params, actor_state, critic_state), (new_lps, als, cls, rws) = jax.lax.scan(
            body, (params, actor_state, critic_state), (Xs, Ys, Ls, ks)
        )
        # next-epoch dataset: this epoch's (shuffled) order with fresh log-probs
        X_next = Xs.reshape(steps * B, -1)
        Y_next = Ys.reshape(steps * B, -1)
        lp_next = new_lps.reshape(steps * B, -1)
        return params, actor_state, critic_state, X_next, Y_next, lp_next, \
            jnp.mean(als), jnp.mean(cls), jnp.mean(rws)

    for epoch in range(cfg.epochs):
        key, k = jax.random.split(key)
        params, actor_state, critic_state, X, Y, old_lp, al, cl, rw = epoch_fn(
            params, actor_state, critic_state, X, Y, old_lp, k
        )
        if log_every and (epoch % log_every == 0 or epoch == cfg.epochs - 1):
            log_fn(f"ppo epoch {epoch}: actor {float(al):.4f} critic {float(cl):.4f} "
                   f"reward {float(rw):.4f}")
    return params, {}


def ppo_predict(agent: PPOAgent, params, X, action_transform):
    """Deterministic eval: mean action -> task transform (PPO.py:322-328)."""
    _, mu, _ = agent.apply({"params": params}, jnp.asarray(X, jnp.float32))
    return action_transform(mu)
