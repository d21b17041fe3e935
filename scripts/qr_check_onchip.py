"""Standalone on-chip QR-orthogonality regression check (the tail of
verify_sym_kernels.py) - run after the fp64-measurement fix."""
import json, sys
sys.path.insert(0, "/root/repo")
from projected_lmc_tpu.utils.tpu import ensure_tpu
ensure_tpu()
import jax, jax.numpy as jnp, numpy as np
p_mix, q_mix = 25, 8
rng = np.random.default_rng(0)
H0 = jnp.asarray(np.linalg.qr(rng.standard_normal((p_mix, p_mix)))[0]
                 @ np.diag(np.linspace(2.0, 0.1, p_mix)), jnp.float32)
from projected_lmc_tpu.models.projected import LMCMixingMatrix
mix = LMCMixingMatrix(H0, jnp.eye(q_mix, dtype=jnp.float32)[:q_mix], bulk=True)
Qm, _, Qo = jax.jit(lambda m: m.QR())(mix)
Qn = np.asarray(Qm, np.float64)
err = float(np.abs(Qn.T @ Qn - np.eye(Qn.shape[1])).max())
if Qo is not None:
    err = max(err, float(np.abs(Qn.T @ np.asarray(Qo, np.float64)).max()))
print(json.dumps({"qr_ortho_err_onchip": err, "qr_ortho_ok": bool(err < 1e-5),
                  "chip": jax.devices()[0].device_kind}))
