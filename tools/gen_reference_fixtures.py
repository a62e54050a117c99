"""Generate golden-value test fixtures by RUNNING the reference torch code.

This script imports the reference DiffSG repo (read-only, at
$DIFFSG_REFERENCE_PATH or /root/reference) and records its outputs on fixed
inputs into small .npz files under tests/fixtures/.  No reference code is
copied into this repo — the fixtures are pure data used to verify that our
TPU-native implementation reproduces the reference numerics bit-for-bit
(within f32 tolerance).

Fixtures produced:
  schedule_T20.npz     cosine betas for T=20 (and T=500)
  preprocess_co.npz    raw CO features -> derived 3-per-node features
  objectives.npz       msr/co/nu objective values on random inputs
  decoders.npz         msr/co/nu decoder outputs on random inputs
  nu_unet_forward.npz  UNet1D forward (NU ckpt weights) on fixed inputs
  nu_sample.npz        full 20-step CFG sampler output with recorded noise
  nu_data_head.npz     loader heads/sizes for the NU split
  alpha_calc.npz       LRH step-direction golden values

Run:  python tools/gen_reference_fixtures.py
"""

import os
import sys
import pathlib

import numpy as np
import torch

REF = pathlib.Path(os.environ.get("DIFFSG_REFERENCE_PATH", "/root/reference"))
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"
OUT.mkdir(parents=True, exist_ok=True)

sys.path.insert(0, str(REF))

from ddpm_opt.diffusion import generate_cosine_schedule  # noqa: E402
from ddpm_opt import classifier_free_MSR as ref_msr  # noqa: E402
from ddpm_opt import classifier_free_CO as ref_co  # noqa: E402
from ddpm_opt import classifier_free_NU as ref_nu  # noqa: E402
from ddpm_opt.UNetCF import UNet1D as RefUNet  # noqa: E402
from utils.dataset import data_preprocess_co as ref_preprocess  # noqa: E402

torch.manual_seed(0)
rng = np.random.default_rng(0)


def save(name, **arrays):
    np.savez(OUT / name, **arrays)
    print(f"wrote {name}: " + ", ".join(f"{k}{v.shape}" for k, v in arrays.items()))


# --- schedules ----------------------------------------------------------------
save(
    "schedule_T20.npz",
    betas_T20=generate_cosine_schedule(20),
    betas_T500=generate_cosine_schedule(500),
)

# --- CO preprociessing ----------------------------------------------------------
raw = np.zeros((16, 6 * 3 + 7))
raw[:, 0:18:6] = rng.uniform(0, 5e5, (16, 3))  # s
raw[:, 1:18:6] = raw[:, 0:18:6] * 3e3  # c
raw[:, 2:18:6] = rng.uniform(1e8, 1e9, (16, 3))  # f_local
raw[:, 3:18:6] = rng.uniform(0.05, 1.0, (16, 3))  # h
raw[:, 4:18:6] = rng.uniform(0, 1, (16, 3))  # alpha
raw[:, 5:18:6] = 1 - raw[:, 4:18:6]  # beta
raw[:, 18:] = np.array([2.5e9, 1e-28, 0.3, 0.1, 1.0, 10e5, 7.96159e-13])
save("preprocess_co.npz", raw=raw, simplified=ref_preprocess(raw))

# --- objectives ----------------------------------------------------------------
p = rng.uniform(0.01, 5.0, (32, 3))
g = rng.uniform(0.5, 2.5, (32, 3))
msr_rate = torch.sum(
    torch.log2(1.0 + torch.tensor(p, dtype=torch.float32) * torch.tensor(g, dtype=torch.float32)),
    dim=1,
).numpy()

co_X = rng.uniform(0.01, 9.0, (32, 9))
co_Y = rng.uniform(0.0, 0.8, (32, 3))
co_Y[::5] *= 0.1  # some rows near-all-local
cost = ref_co.cost_calc(
    torch.tensor(co_X, dtype=torch.float32), torch.tensor(co_Y, dtype=torch.float32)
).numpy()

nu_Y = np.concatenate(
    [rng.uniform(0, 400, (32, 2)), rng.uniform(0.5, 10.0, (32, 3))], axis=1
)
nu_X = rng.uniform(0, 400, (32, 6))
nu_rates = ref_nu.rate_calc(
    torch.tensor(nu_Y, dtype=torch.float32), torch.tensor(nu_X, dtype=torch.float32)
).numpy()
save(
    "objectives.npz",
    msr_p=p, msr_g=g, msr_rate=msr_rate,
    co_X=co_X, co_Y=co_Y, co_cost=cost,
    nu_Y=nu_Y, nu_X=nu_X, nu_rate=nu_rates,
)

# --- decoders -------------------------------------------------------------------
y_raw = rng.normal(0, 3.0, (32, 3))
y_raw[3] = -50.0  # trigger CO all-local sentinel
msr_dec = ref_msr.custom_decoder(torch.tensor(y_raw, dtype=torch.float32)).numpy()
co_dec = ref_co.customized_real_decoder(torch.tensor(y_raw, dtype=torch.float32)).numpy()
y_nu_raw = rng.normal(0, 3.0, (32, 5))
nu_dec = ref_nu.custom_decoder(
    torch.tensor(y_nu_raw, dtype=torch.float32), 400, 400, 18.0
).numpy()
save(
    "decoders.npz",
    y_raw=y_raw, msr_dec=msr_dec, co_dec=co_dec,
    y_nu_raw=y_nu_raw, nu_dec=nu_dec,
)

# --- NU UNet forward with reference ckpt weights --------------------------------
T = 20
alphas = 1.0 - generate_cosine_schedule(T)
net = RefUNet(input_dim=5, proj_dim=32, cond_dim=6,
              dims=(32, 16, 8), is_attn=(False, False, False),
              middle_attn=False, n_blocks=2)
ddpm = ref_nu.DDPM(T, net, 3, 18.0, alphas, torch.device("cpu"), (1, 5), None,
                   0.1, 0.9999, 10, 5, False)
ddpm.load_state_dict(torch.load(REF / "ckpts" / "ddpm_nu_3u.pt", weights_only=True))
ddpm.eval()

B = 8
y_t = rng.normal(0, 1, (B, 5)).astype(np.float32)
cond = rng.uniform(0, 1, (B, 6)).astype(np.float32)
t_int = rng.integers(0, T, (B,))
with torch.no_grad():
    eps_cond = net(
        torch.tensor(y_t),
        (torch.tensor(t_int, dtype=torch.float32)[None, :]) / T,
        torch.tensor(cond),
        torch.ones(B, 1),
    ).numpy()
    eps_uncond = net(
        torch.tensor(y_t),
        (torch.tensor(t_int, dtype=torch.float32)[None, :]) / T,
        torch.tensor(cond),
        torch.zeros(B, 1),
    ).numpy()
save(
    "nu_unet_forward.npz",
    y_t=y_t, cond=cond, t_int=t_int, eps_cond=eps_cond, eps_uncond=eps_uncond,
)

# --- full sampler parity: record every noise the reference draws ----------------
B = 16
cond = rng.uniform(0, 1, (B, 6)).astype(np.float32)
init_noise = rng.normal(0, 1, (B, 5)).astype(np.float32)
step_noises = rng.normal(0, 1, (T, B, 5)).astype(np.float32)

noise_iter = iter(
    [torch.tensor(init_noise)] + [torch.tensor(z) for z in step_noises]
)
orig_randn = torch.randn


def fake_randn(*size, **kw):
    kw.pop("device", None)
    return next(noise_iter)


torch.randn = fake_randn
try:
    with torch.no_grad():
        y0_ref = ddpm.sample(torch.tensor(cond), omega=500).numpy()
finally:
    torch.randn = orig_randn
# NOTE: the reference draws a step noise for every i but only USES it for
# i > 1; our recorded step_noises list is consumed in the same order.
save(
    "nu_sample.npz",
    cond=cond, init_noise=init_noise, step_noises=step_noises,
    omega=np.array(500.0), y0=y0_ref,
)

# --- end-to-end NU eval numbers (in-distribution test split) --------------------
X_train, Y_train, X_test, Y_test, R_test, cc = ref_nu.nu_data_load(
    str(REF / "datasets" / "3u_18mW_10000samples.csv"), 400, 400
)
K, P_sum = cc["K"], cc["P_sum"]
save(
    "nu_data_head.npz",
    X_train_head=X_train[:8], Y_train_head=Y_train[:8],
    X_test_head=X_test[:8], Y_test_head=Y_test[:8],
    n_train=np.array(X_train.shape[0]), n_test=np.array(X_test.shape[0]),
    P_sum=np.array(P_sum), K=np.array(K),
)

print("all fixtures written to", OUT)

# --- generator internals: alpha_calc golden values -------------------------------
from utils.dataset_generate import alpha_calc as ref_alpha_calc  # noqa: E402

grads = rng.normal(0, 1, (32, 5))
grads[3, 2] = 0.9  # exercise pivot paths
save("alpha_calc.npz", grads=grads, alpha=ref_alpha_calc(grads.copy()))
