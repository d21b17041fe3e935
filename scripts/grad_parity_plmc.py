"""Gradient parity: JAX fp64 projected_lmc_mll grads vs torch-fp64 autograd
of the oracle's plmc_loss, at init AND at a perturbed point. If these match,
the JAX algebra+VJPs are certified and the trajectory divergence is
dynamics/precision; if not, we've found the bug coordinate."""
import os, sys, math
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import torch
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
if jax.default_backend() != "cpu":
    from jax._src import xla_bridge as _xb
    _xb._clear_backends(); _xb.get_backend.cache_clear()
assert jax.default_backend() == "cpu"
import jax.numpy as jnp

from oracle_plmc_synthetic import plmc_loss
from projected_lmc_tpu.experiments.driver import build_models
from projected_lmc_tpu.experiments.synthetic import generate_synthetic
from projected_lmc_tpu.mlls import projected_lmc_mll
from projected_lmc_tpu.training import trainable_mask, partition, combine

n, p, q = 500, 100, 25
data = generate_synthetic(n=n, p=p, q=q, q_noise=25, mu_noise=0.1,
                          mu_str=0.9, max_scale=0.5, n_test=2500, seed=0)
dX = np.asarray(data["X"], np.float64)
dY = np.asarray(data["Y"], np.float64)
X64 = torch.tensor(dX)            # (n, 1) — shared data on both sides
Y64 = torch.tensor(dY)

model = build_models(jnp.asarray(dX), jnp.asarray(dY), q, p, ["PLMC"],
                     seed=0)["PLMC"]

# torch params copied from the JAX init (shared starting point)
H_t = torch.tensor(np.asarray(model.lmc_coefficients.H, np.float64))
raw_ls_t = torch.tensor(np.asarray(
    model.covar_module.raw_lengthscale, np.float64)).reshape(q, 1, 1)
raw_noise_t = torch.tensor(np.asarray(
    model.likelihood.raw_noise, np.float64)).reshape(q)
B_raw_t = torch.tensor(np.asarray(model.B_tilde_inv_chol_raw, np.float64))
M_t = torch.tensor(np.asarray(model.M, np.float64))

gen = torch.Generator().manual_seed(7)
def perturb(t, scale=0.05):
    return t + scale * torch.randn(t.shape, generator=gen, dtype=t.dtype)

for tag, pert in [("init", False), ("perturbed", True)]:
    if pert:
        H_t = perturb(H_t); raw_ls_t = perturb(raw_ls_t)
        raw_noise_t = perturb(raw_noise_t); B_raw_t = perturb(B_raw_t)
        M_t = perturb(M_t, 0.02)
    tp = [x.clone().requires_grad_(True)
          for x in (H_t, raw_ls_t, raw_noise_t, B_raw_t, M_t)]
    loss_t = plmc_loss(*tp, X64, Y64)
    loss_t.backward()
    g_torch = {k: x.grad.numpy() for k, x in
               zip(("H", "raw_ls", "raw_noise", "B_raw", "M"), tp)}

    # mirror the same params into the JAX model
    m = model
    m = m.replace(lmc_coefficients=m.lmc_coefficients.replace(
        H=jnp.asarray(tp[0].detach().numpy())))
    # kernel raw lengthscales: raw_lengthscale has shape (q, 1, d=1)
    kr = tp[1].detach().numpy().reshape(m.covar_module.raw_lengthscale.shape)
    m = m.replace(covar_module=m.covar_module.replace(
        raw_lengthscale=jnp.asarray(kr)))
    m = m.replace(likelihood=m.likelihood.replace(
        raw_noise=jnp.asarray(tp[2].detach().numpy()[:, None])))
    m = m.replace(B_tilde_inv_chol_raw=jnp.asarray(tp[3].detach().numpy()),
                  M=jnp.asarray(tp[4].detach().numpy()))

    val_j = float(projected_lmc_mll(m))
    val_t = float(-loss_t)
    n_ = n
    print(f"[{tag}] mll jax={val_j:.10f} torch={val_t:.10f} "
          f"diff={abs(val_j-val_t):.3e}", flush=True)

    mask = trainable_mask(m)
    params, static = partition(m, mask)
    gfun = jax.grad(lambda pp: projected_lmc_mll(combine(pp, static)))
    g = gfun(params)
    gH = np.asarray(g.lmc_coefficients.H)
    gnoise = np.asarray(g.likelihood.raw_noise)[:, 0]
    gB = np.asarray(g.B_tilde_inv_chol_raw)
    gM = np.asarray(g.M)
    gls = np.asarray(g.covar_module.raw_lengthscale).reshape(-1)

    def rep(name, a, b):
        a = np.asarray(a); b = np.asarray(b)
        # torch grads are of loss = -mll; jax grads are of mll
        d = np.abs(a + b).max()
        s = max(np.abs(a).max(), np.abs(b).max(), 1e-30)
        print(f"  {name}: max|dj+dt|={d:.3e} rel={d/s:.3e}", flush=True)

    rep("H", gH, g_torch["H"])
    rep("raw_ls", gls, g_torch["raw_ls"][:, 0, 0])
    rep("raw_noise", gnoise, g_torch["raw_noise"])
    rep("B_raw", gB, g_torch["B_raw"])
    rep("M", gM, g_torch["M"])
print("GRAD PARITY DONE")
