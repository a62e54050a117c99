"""Mid-training checkpoint/resume: a resumed run must reproduce the
uninterrupted run exactly (same params), since the epoch RNG stream is
derived from the epoch index."""

import numpy as np
import jax
import jax.numpy as jnp

from diffsg_tpu.models.unet1d import UNet1D
from diffsg_tpu.train import TrainConfig, train_ddpm
from diffsg_tpu.utils import load_checkpoint


def _data(n=256, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 1, (n, 3))
    Y = rng.dirichlet(np.ones(3), n)
    return X, Y


def test_resume_matches_uninterrupted(tmp_path):
    X, Y = _data()
    model = UNet1D(input_dim=3, proj_dim=16, cond_dim=3, dims=(8, 4),
                   is_attn=(False, False), middle_attn=False, n_blocks=1)
    cfg = TrainConfig(epochs=6, batch_size=64, lr=1e-3, milestones=(100,),
                      T=10, seed=0)

    # uninterrupted 6 epochs
    p_full, ema_full, _ = train_ddpm(model, X, Y, cfg, log_every=0)

    # 3 epochs with checkpointing, then resume for the remaining 3
    ckdir = str(tmp_path / "ck")
    cfg3 = TrainConfig(epochs=3, batch_size=64, lr=1e-3, milestones=(100,),
                       T=10, seed=0)
    train_ddpm(model, X, Y, cfg3, log_every=0,
               checkpoint_every=3, checkpoint_dir=ckdir)
    ck = load_checkpoint(ckdir)
    assert ck["metadata"]["epoch"] == 3 and ck["step"] == 12  # 3 epochs x 4 steps
    p_res, ema_res, _ = train_ddpm(model, X, Y, cfg, log_every=0,
                                   resume_state=ck)

    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_res)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
