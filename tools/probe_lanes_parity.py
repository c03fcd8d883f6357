import sys
sys.path.insert(0, "/root/repo")
import jax, time
from pathlib import Path
jax.config.update("jax_compilation_cache_dir",
                  str(Path.home() / ".cache" / "regneuralde_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp, numpy as np
from regneuralde_tpu.models import MLPDynamics, NeuralODE
from regneuralde_tpu import reg

print("devices:", jax.devices(), flush=True)
B, D, H = 64, 64, 32
key = jax.random.PRNGKey(0)
m = MLPDynamics(dim=D, hidden=H)
x = jax.random.normal(key, (B, D)) * 0.5
node_f = NeuralODE(m, rtol=1e-6, atol=1e-6, max_steps=64,
                   per_sample="batched", fused=True)
node_u = NeuralODE(m, rtol=1e-6, atol=1e-6, max_steps=64,
                   per_sample="batched")
p = node_f.init(jax.random.PRNGKey(1), x)

t0 = time.time()
out_f = jax.jit(lambda p: node_f(p, x).nfe)(p)
print(f"fused fwd compiled in {time.time()-t0:.0f}s", flush=True)
out_u = jax.jit(lambda p: node_u(p, x).nfe)(p)
nf, nu = np.asarray(out_f), np.asarray(out_u)
dn = np.abs(nf - nu)
print("per-lane NFE fused:", nf[:8], "traced:", nu[:8],
      "max|d|:", dn.max(), "equal lanes:", (dn == 0).sum(), "/", B, flush=True)

def loss(p, node, mode="adjoint"):
    out = node(p, x, mode=mode)
    return (jnp.sum(out.value ** 2)
            + 10.0 * reg.error_estimate(out.telemetry, agg="mean"))

t0 = time.time()
g_f = jax.jit(jax.grad(lambda p: loss(p, node_f)))(p)
print(f"fused grad compiled in {time.time()-t0:.0f}s", flush=True)
g_s = jax.jit(jax.grad(lambda p: loss(p, node_f, "scan")))(p)
g_u = jax.jit(jax.grad(lambda p: loss(p, node_u, "scan")))(p)
fl = lambda g: np.concatenate([np.asarray(l).ravel()
                               for l in jax.tree_util.tree_leaves(g)])
a, b, c = fl(g_f), fl(g_s), fl(g_u)
cos = lambda u, v: float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))
print("grad finite:", np.isfinite(a).all(),
      "| adjoint-vs-scan(fused) cos:", cos(a, b),
      "rel:", float(np.linalg.norm(a - b) / np.linalg.norm(b)),
      "| fused-vs-traced cos:", cos(b, c), flush=True)
print("PROBE_OK")
