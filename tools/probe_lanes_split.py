import sys, time
sys.path.insert(0, "/root/repo")
import jax
from pathlib import Path
jax.config.update("jax_compilation_cache_dir",
                  str(Path.home() / ".cache" / "regneuralde_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp, numpy as np
import flax.linen as nn, optax
from regneuralde_tpu import reg
from regneuralde_tpu.models import ClassifierNODE, MLPDynamics, NeuralODE
from regneuralde_tpu.ops import pallas_mlp

B, D, H = 512, 784, 100
RT = 1.4e-8
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, D)) * 0.3
yl = jax.nn.one_hot(jax.random.randint(key, (B,), 0, 10), 10)
sync = lambda r: float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])

def build(fused):
    node = NeuralODE(MLPDynamics(dim=D, hidden=H), tspan=(0.0, 1.0),
                     time_dep=True, rtol=RT, atol=RT, max_steps=96,
                     fused=fused, per_sample="batched")
    clf = ClassifierNODE(None, node, nn.Dense(10))
    p = clf.init(jax.random.PRNGKey(1), x)
    fwd = jax.jit(lambda p: clf(p, x).nfe.sum() * 1.0)
    def loss(p):
        out = clf(p, x)
        ce = optax.softmax_cross_entropy(out.logits, yl).mean()
        return ce + 1e2 * reg.error_estimate(out.telemetry, agg="mean")
    g = jax.jit(jax.value_and_grad(loss))
    sync(fwd(p)); sync(g(p))
    return fwd, g, p

def timeit(fn, p, n=8):
    sync(fn(p))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(p)
        sync(r)
        ts.append((time.perf_counter() - t0) / n * 1e3)
    return float(np.median(ts))

for name, fused in (("traced", False), ("fused", True)):
    fwd, g, p = build(fused)
    print(f"{name}: fwd {timeit(fwd, p):.2f} ms  grad {timeit(g, p):.2f} ms", flush=True)

# hybrid: fused forward kernel, traced XLA backward
pallas_mlp.USE_PALLAS_BWD = False
fwd, g, p = build(True)
print(f"hybrid(fused fwd, traced bwd): fwd {timeit(fwd, p):.2f} ms  grad {timeit(g, p):.2f} ms", flush=True)
