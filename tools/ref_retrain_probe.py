"""Rerun the REFERENCE's own baseline training recipe (torch, CPU) and
report where a fresh run lands vs the shipped reference checkpoint.

This is a parity *attribution* tool: our JAX retrains of MTFNN-NU cluster
at ~0.89 less-ratio while the shipped reference ckpt evaluates at 0.93336.
Our eval of the imported ckpt reproduces 0.93336 exactly, and our training
recipe matches the reference hyperparameter-for-hyperparameter — so the
open question is whether the reference's *own* training code reproduces
its shipped checkpoint's quality from scratch, or whether that ckpt is a
favorable draw.  This script answers it by importing the reference modules
(read-only) and driving the exact loop from
``/root/reference/baselines/MTFNN.py:213-287`` (mtfnn_nu) minus the final
``torch.save`` (the reference tree is read-only).

The same question applies to PPO-NU (shipped ckpt 0.56615; our JAX retrains
0.426-0.522, high variance) — ``ppo-nu`` reruns
``/root/reference/baselines/PPO.py:363-484`` verbatim.

Usage:
  python tools/ref_retrain_probe.py {mtfnn-nu,ppo-nu} [--seed N] [--epochs N]
"""

import argparse
import pathlib
import sys

import numpy as np
import torch
import torch.nn.functional as F
import torch.optim as optim
import torch.utils.data as data

REF = pathlib.Path("/root/reference")
sys.path.insert(0, str(REF))


def mtfnn_nu_probe(seed: int, epochs: int) -> float:
    # Mirrors /root/reference/baselines/MTFNN.py:213-287 exactly
    # (lr 0.005, MultiStepLR [20,60], batch 512 shuffled, N(0,0.01) init,
    # loss = F.mse_loss(y_true, model(x)), zero_grad after step).
    from baselines.MTFNN import MTFNN  # noqa: E402
    from ddpm_opt.classifier_free_NU import nu_data_load, rate_calc  # noqa: E402
    from ddpm_opt.diffusion import init_weights  # noqa: E402

    torch.manual_seed(seed)
    np.random.seed(seed)

    width, height = 400, 400
    X_train, Y_train, X_test, Y_test, R_test, cc = nu_data_load(
        str(REF / "datasets/3u_18mW_10000samples.csv"), width, height)
    dataset = data.TensorDataset(torch.tensor(X_train, dtype=torch.float32),
                                 torch.tensor(Y_train, dtype=torch.float32))
    loader = data.DataLoader(dataset, batch_size=512, shuffle=True)
    K, P_sum = cc["K"], cc["P_sum"]

    model = MTFNN(K * 2, 2 + K)
    model.apply(init_weights)
    optimizer = optim.Adam(model.parameters(), lr=0.005)
    lr_scheduler = torch.optim.lr_scheduler.MultiStepLR(optimizer, [20, 60])

    for epoch in range(epochs):
        epoch_loss, n = 0.0, 0
        for x, y_true in loader:
            loss = F.mse_loss(y_true, model(x))
            loss.backward()
            optimizer.step()
            optimizer.zero_grad()
            epoch_loss += loss.item()
            n += x.shape[0]
        if epoch % 10 == 0 or epoch == epochs - 1:
            print(f"epoch {epoch}: loss {epoch_loss / n:.8f}")
        lr_scheduler.step()

    with torch.no_grad():
        Y_pred = model(torch.tensor(X_test, dtype=torch.float32))
    X_t = torch.tensor(X_test, dtype=torch.float32)
    for i in range(K):
        X_t[:, 2 * i] *= width
        X_t[:, 2 * i + 1] *= height
    Y_t = torch.tensor(Y_test, dtype=torch.float32)
    Y_t[:, 0] *= width
    Y_t[:, 1] *= height
    Y_t[:, 2:] *= P_sum
    Y_pred[:, 0] *= width
    Y_pred[:, 1] *= height
    Y_pred[:, 2:] *= P_sum
    less_ratio = float(torch.sum(rate_calc(Y_pred, X_t)) /
                       torch.sum(rate_calc(Y_t, X_t)))
    print(f'{{"probe": "ref-mtfnn-nu", "seed": {seed}, '
          f'"less_ratio": {less_ratio}}}')
    return less_ratio


def ppo_nu_probe(seed: int, epochs: int) -> float:
    # Mirrors /root/reference/baselines/PPO.py:363-484 exactly (lr 0.005
    # for actor+critic, MultiStepLR [20], batch 512, Normal(0.5, 0.2)
    # warm-start distribution, replay of the previous epoch's states,
    # mean-action eval through custom_decoder).
    from baselines.PPO import (  # noqa: E402
        PPOAgent, calc_advantage, clipped_surrogate_objective_loss,
        nu_env_step)
    from ddpm_opt.classifier_free_NU import (  # noqa: E402
        nu_data_load, rate_calc, custom_decoder)
    from torch.distributions import Normal  # noqa: E402

    torch.manual_seed(seed)
    np.random.seed(seed)

    width, height = 400, 400
    X_train, Y_train, X_test, Y_test, R_test, cc = nu_data_load(
        str(REF / "datasets/3u_18mW_10000samples.csv"), width, height)
    Y_train[:, 0] *= width
    Y_train[:, 1] *= height
    K, P_sum = cc["K"], cc["P_sum"]
    Y_train[:, -3:] *= P_sum

    agent = PPOAgent(K * 2, K + 2)
    actor_opt = optim.Adam(agent.actor.parameters(), lr=0.005)
    actor_sched = torch.optim.lr_scheduler.MultiStepLR(actor_opt, [20])
    critic_opt = optim.Adam(agent.critic.parameters(), lr=0.005)
    critic_sched = torch.optim.lr_scheduler.MultiStepLR(critic_opt, [20])

    X_tr = torch.tensor(X_train, dtype=torch.float32)
    Y_tr = torch.tensor(Y_train, dtype=torch.float32)
    with torch.no_grad():
        dist = Normal(0.5 * torch.ones_like(Y_tr), 0.2 * torch.ones_like(Y_tr))
        old_prob = dist.log_prob(dist.sample())
        loader = data.DataLoader(data.TensorDataset(X_tr, Y_tr, old_prob),
                                 batch_size=512, shuffle=True)

    for it in range(epochs):
        X_next, Y_next, lp_next = None, None, None
        ep_r, n = 0.0, 0
        for x, y, old_log_prob in loader:
            values, distributions = agent(x)
            actions = distributions.sample()
            new_log_prob = distributions.log_prob(actions)
            actions = torch.softmax(actions, dim=1)
            _, rewards = nu_env_step(
                x, custom_decoder(actions, width, height, P_sum), y, cc)
            advantages, returns = calc_advantage(rewards, values)
            ratio = (new_log_prob - old_log_prob).exp()
            actor_loss = clipped_surrogate_objective_loss(ratio, advantages)
            actor_loss.backward(retain_graph=True)
            critic_loss = F.mse_loss(values, returns)
            critic_loss.backward()
            actor_opt.step()
            actor_opt.zero_grad()
            critic_opt.step()
            critic_opt.zero_grad()
            ep_r += float(torch.sum(rewards))
            n += x.shape[0]
            with torch.no_grad():
                if X_next is None:
                    X_next, Y_next, lp_next = x, y, new_log_prob
                else:
                    X_next = torch.concatenate((X_next, x))
                    Y_next = torch.concatenate((Y_next, y))
                    lp_next = torch.concatenate((lp_next, new_log_prob))
        with torch.no_grad():
            loader = data.DataLoader(
                data.TensorDataset(X_next, Y_next, lp_next),
                batch_size=512, shuffle=True)
        actor_sched.step()
        critic_sched.step()
        if it % 10 == 0 or it == epochs - 1:
            print(f"epoch {it}: reward {ep_r / n:.4f}")

    X_te = torch.tensor(X_test, dtype=torch.float32)
    with torch.no_grad():
        _, distributions = agent(X_te)
        Y_pred = custom_decoder(distributions.mean, width, height, P_sum)
    for i in range(K):
        X_te[:, 2 * i] *= width
        X_te[:, 2 * i + 1] *= height
    Y_t = torch.tensor(Y_test, dtype=torch.float32)
    Y_t[:, 0] *= width
    Y_t[:, 1] *= height
    Y_t[:, 2:] *= P_sum
    less_ratio = float(torch.sum(rate_calc(Y_pred, X_te)) /
                       torch.sum(rate_calc(Y_t, X_te)))
    print(f'{{"probe": "ref-ppo-nu", "seed": {seed}, '
          f'"less_ratio": {less_ratio}}}')
    return less_ratio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["mtfnn-nu", "ppo-nu"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()
    if args.which == "mtfnn-nu":
        mtfnn_nu_probe(args.seed, args.epochs or 100)
    else:
        ppo_nu_probe(args.seed, args.epochs or 50)


if __name__ == "__main__":
    main()
