"""Checkpoint round-trip tests."""

import numpy as np
import jax
import jax.numpy as jnp

from diffsg_tpu.utils import save_checkpoint, load_checkpoint
from diffsg_tpu.train import ema_init, ema_update
from diffsg_tpu.diffusion import cosine_schedule


def test_roundtrip(tmp_path):
    params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3), "bias": jnp.ones(3)}}
    ema = ema_update(ema_init(params), params, 0.999)
    sched = cosine_schedule(20)
    save_checkpoint(str(tmp_path / "ck"), params, ema=ema, step=42, sched=sched,
                    metadata={"task": "msr"})
    ck = load_checkpoint(str(tmp_path / "ck"))
    np.testing.assert_allclose(ck["params"]["dense"]["kernel"],
                               np.arange(6).reshape(2, 3))
    assert ck["step"] == 42
    assert int(ck["ema"].n_averaged) == 1
    np.testing.assert_allclose(np.asarray(ck["sched"].betas),
                               np.asarray(sched.betas), rtol=1e-7)
    assert ck["metadata"]["task"] == "msr"


def test_roundtrip_through_training_state(tmp_path):
    """Params trained a step, saved, reloaded -> identical apply output."""
    from diffsg_tpu.models.unet1d import UNet1D

    model = UNet1D(input_dim=3, proj_dim=16, cond_dim=3, dims=(8, 4),
                   is_attn=(False, False), middle_attn=False, n_blocks=1)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1,)),
                   jnp.zeros((1, 3)), jnp.ones((1, 1)))
    save_checkpoint(str(tmp_path / "ck"), v["params"])
    ck = load_checkpoint(str(tmp_path / "ck"))
    x = jnp.ones((4, 3))
    out1 = model.apply({"params": v["params"]}, x, jnp.ones((4,)), x, jnp.ones((4, 1)))
    out2 = model.apply({"params": ck["params"]}, x, jnp.ones((4,)), x, jnp.ones((4, 1)))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_torch_export_roundtrip(tmp_path, reference_path):
    """Export to the reference torch layout, re-import, compare exactly.
    (Strict-load into the actual reference DDPM class is CI-verified below in
    test_torch_export_strict_loads_into_reference_class.)"""
    import pytest

    pt = reference_path / "ckpts" / "ddpm_nu_3u.pt"
    if not pt.exists():
        pytest.skip("NU ckpt missing")
    from diffsg_tpu.utils.torch_import import ddpm_from_torch
    from diffsg_tpu.utils.torch_export import ddpm_to_torch
    from diffsg_tpu.train.ema import EmaState

    params, ema_p, sched, _ = ddpm_from_torch(str(pt))
    out = str(tmp_path / "exported.pt")
    ddpm_to_torch(out, params, sched, EmaState(ema_p, jnp.asarray(3, jnp.int32)))
    p2, e2, s2, n2 = ddpm_from_torch(out)
    assert n2 == 3
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(sched.betas), np.asarray(s2.betas),
                               rtol=1e-7)


def test_orbax_roundtrip(tmp_path):
    pytest_orbax = __import__("pytest")
    try:
        import orbax.checkpoint  # noqa: F401
    except ImportError:
        pytest_orbax.skip("orbax not installed")
    from diffsg_tpu.utils.orbax_io import save_checkpoint_orbax, load_checkpoint_orbax
    from diffsg_tpu.train import ema_init, ema_update
    from diffsg_tpu.diffusion import cosine_schedule

    params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3),
                        "bias": jnp.ones(3)}}
    ema = ema_update(ema_init(params), params, 0.999)
    sched = cosine_schedule(20)
    save_checkpoint_orbax(str(tmp_path / "ock"), params, ema=ema, step=7,
                          sched=sched, metadata={"task": "msr"})
    ck = load_checkpoint_orbax(str(tmp_path / "ock"))
    np.testing.assert_allclose(np.asarray(ck["params"]["dense"]["kernel"]),
                               np.arange(6).reshape(2, 3))
    assert ck["step"] == 7 and int(np.asarray(ck["ema"].n_averaged)) == 1
    np.testing.assert_allclose(np.asarray(ck["sched"].betas),
                               np.asarray(sched.betas), rtol=1e-7)


def _export_strict_load_forward_compare(tmp_path, reference_path, ckpt_name,
                                        model_fn, input_dim, cond_dim,
                                        arch=None, seed=0):
    """Shared export-parity flow: load a committed framework checkpoint,
    export it to the reference torch layout, strict-load into the ACTUAL
    reference ``DDPM(UNet1D)`` classes (``classifier_free_NU.py:79-180``),
    and compare a denoiser forward pass torch-vs-flax.

    ``arch`` defaults to the checkpoint's own ``metadata['arch']`` record
    (proj_dim/dims/n_blocks/is_attn/middle_attn), so the reference net is
    constructed from one source of truth; ``model_fn(arch)`` builds the
    matching flax module."""
    import pathlib
    import sys

    import pytest

    torch = pytest.importorskip("torch")
    ck_dir = pathlib.Path(__file__).resolve().parent.parent \
        / "ckpts" / ckpt_name
    if not ck_dir.is_dir():
        pytest.skip(f"committed ckpt {ckpt_name} missing")
    sys.path.insert(0, str(reference_path))
    try:
        from ddpm_opt import classifier_free_NU as ref_nu
        from ddpm_opt.UNetCF import UNet1D as RefUNet
        from ddpm_opt.diffusion import generate_cosine_schedule
    finally:
        sys.path.remove(str(reference_path))

    from diffsg_tpu.utils import load_checkpoint
    from diffsg_tpu.utils.torch_export import ddpm_to_torch

    ck = load_checkpoint(str(ck_dir))
    if arch is None:
        arch = ck["metadata"]["arch"]
    out_pt = str(tmp_path / "exported.pt")
    ddpm_to_torch(out_pt, ck["params"], ck["sched"], ck.get("ema"))

    T = int(np.asarray(ck["sched"].betas).shape[0])
    dims = tuple(arch["dims"])
    net = RefUNet(input_dim=input_dim, proj_dim=arch["proj_dim"],
                  cond_dim=cond_dim, dims=dims,
                  is_attn=tuple(arch.get("is_attn", (False,) * len(dims))),
                  middle_attn=arch.get("middle_attn", False),
                  n_blocks=arch.get("n_blocks", 2))
    alphas = 1.0 - generate_cosine_schedule(T)
    ddpm = ref_nu.DDPM(T, net, 3, 18.0, alphas, torch.device("cpu"),
                       (1, input_dim), None, 0.1, 0.9999, 10, 5, False)
    res = ddpm.load_state_dict(
        torch.load(out_pt, weights_only=True), strict=True)  # raises on skew
    assert not res.missing_keys and not res.unexpected_keys
    ddpm.eval()

    rng = np.random.default_rng(seed)
    B = 16
    y = rng.normal(0, 1, (B, input_dim)).astype(np.float32)
    cond = rng.uniform(0, 1, (B, cond_dim)).astype(np.float32)
    t = rng.integers(0, T, (B,))
    with torch.no_grad():
        # time is passed (1, B)/T exactly as the reference sampler does
        # (tools/gen_reference_fixtures.py NU block)
        ref_out = net(torch.from_numpy(y),
                      torch.from_numpy((t[None, :] / T).astype(np.float32)),
                      torch.from_numpy(cond),
                      torch.ones(B, 1)).numpy()
    model = model_fn(arch)
    ours = np.asarray(model.apply(
        {"params": ck["params"]}, jnp.asarray(y),
        jnp.asarray(t / T, jnp.float32), jnp.asarray(cond),
        jnp.ones((B, 1))))
    np.testing.assert_allclose(ours, ref_out, atol=2e-5, rtol=1e-4)


def test_torch_export_strict_loads_into_reference_class(tmp_path,
                                                        reference_path):
    """Export a framework-trained NU ckpt and strict-load it into the ACTUAL
    reference classes, forward-compared.  This is the claim docs/PARITY.md
    makes for torch_export; here it runs in CI."""
    from diffsg_tpu.models import unet_nu

    # the aug32_s8c ckpt predates the arch metadata record: its config is
    # the standard NU zoo entry (unet_nu), passed explicitly
    _export_strict_load_forward_compare(
        tmp_path, reference_path, "ddpm_nu_3u_aug32_s8c",
        model_fn=lambda arch: unet_nu(3), input_dim=5, cond_dim=6,
        arch={"proj_dim": 32, "dims": (32, 16, 8)}, seed=0)


def test_torch_export_multi_strict_loads_into_reference_class(tmp_path,
                                                              reference_path):
    """The MULTI-TASK checkpoint (a model family the reference does not have)
    still exports to the reference torch layout: strict-load + forward-compare
    with the multi config (input_dim=5 canvas, cond_dim=12 one-hot+payload),
    reconstructed entirely from the checkpoint's own arch metadata.

    Layout parity only: ddpm_multi is x0-parameterized (checkpoint
    metadata), so the reference's eps-interpreting sampler would mis-use the
    weights — the export is for weight interchange, not drop-in sampling."""
    from diffsg_tpu.tasks.multi import unet_multi, D_UNI, COND_UNI

    _export_strict_load_forward_compare(
        tmp_path, reference_path, "ddpm_multi",
        model_fn=lambda arch: unet_multi(arch["proj_dim"],
                                         tuple(arch["dims"])),
        input_dim=D_UNI, cond_dim=COND_UNI, seed=1)


def test_attention_config_torch_roundtrip(tmp_path, reference_path):
    """Checkpoint interchange for ATTENTION-enabled configs (a dormant
    reference capability: ``UNetCF.py:98-157`` AttentionBlock, instantiated
    with has_attn=False in every shipped model).  A torch-constructed
    ``has_attn=True`` UNet1D round-trips: import -> flax forward parity ->
    export -> strict-load into a fresh reference DDPM with identical keys.

    The reference block defines a LayerNorm (``norm``) it never applies in
    its own forward; our flax twin materializes the same params so the key
    sets match exactly (models/unet1d.py AttentionBlock)."""
    import pathlib
    import sys

    import pytest

    torch = pytest.importorskip("torch")
    sys.path.insert(0, str(reference_path))
    try:
        from ddpm_opt import classifier_free_NU as ref_nu
        from ddpm_opt.UNetCF import UNet1D as RefUNet
        from ddpm_opt.diffusion import generate_cosine_schedule
    finally:
        sys.path.remove(str(reference_path))

    from diffsg_tpu.models.unet1d import UNet1D
    from diffsg_tpu.utils.torch_export import ddpm_to_torch
    from diffsg_tpu.utils.torch_import import ddpm_from_torch

    T = 20
    kw = dict(input_dim=5, proj_dim=32, cond_dim=6, dims=(32, 16, 8),
              is_attn=(True, False, True), middle_attn=True, n_blocks=2)
    torch.manual_seed(0)
    net = RefUNet(**kw)
    alphas = 1.0 - generate_cosine_schedule(T)
    ddpm = ref_nu.DDPM(T, net, 3, 18.0, alphas, torch.device("cpu"), (1, 5),
                       None, 0.1, 0.9999, 10, 5, False)
    ddpm.eval()
    src_pt = str(tmp_path / "attn_src.pt")
    torch.save(ddpm.state_dict(), src_pt)

    # --- import: torch -> flax, forward parity -----------------------------
    params, ema_params, sched, _ = ddpm_from_torch(src_pt)
    model = UNet1D(**kw)
    rng = np.random.default_rng(2)
    B = 16
    y = rng.normal(0, 1, (B, 5)).astype(np.float32)
    cond = rng.uniform(0, 1, (B, 6)).astype(np.float32)
    t = rng.integers(0, T, (B,))
    with torch.no_grad():
        ref_out = net(torch.from_numpy(y),
                      torch.from_numpy((t[None, :] / T).astype(np.float32)),
                      torch.from_numpy(cond),
                      torch.ones(B, 1)).numpy()
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(y), jnp.asarray(t / T, jnp.float32),
        jnp.asarray(cond), jnp.ones((B, 1))))
    np.testing.assert_allclose(ours, ref_out, atol=2e-5, rtol=1e-4)

    # --- export: flax -> torch, strict-load + exact key set -----------------
    from diffsg_tpu.train.ema import EmaState

    out_pt = str(tmp_path / "attn_roundtrip.pt")
    ddpm_to_torch(out_pt, params, sched,
                  EmaState(params=ema_params, n_averaged=0))
    fresh = ref_nu.DDPM(T, RefUNet(**kw), 3, 18.0, alphas,
                        torch.device("cpu"), (1, 5), None, 0.1, 0.9999,
                        10, 5, False)
    res = fresh.load_state_dict(torch.load(out_pt, weights_only=True),
                                strict=True)
    assert not res.missing_keys and not res.unexpected_keys
    exported = torch.load(out_pt, weights_only=True)
    original = torch.load(src_pt, weights_only=True)
    assert set(exported) == set(original)
    for k in original:
        np.testing.assert_allclose(exported[k].numpy(), original[k].numpy(),
                                   atol=1e-6, err_msg=k)
