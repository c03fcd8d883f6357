"""Per-component profile of the mnist_nsde train step on the TPU."""
import sys, time
from pathlib import Path as _P
sys.path.insert(0, str(_P(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", str(_P.home() / ".cache" / "regneuralde_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np
import optax
import flax.linen as nn
from regneuralde_tpu import reg
from regneuralde_tpu.models import MLP, NeuralSDE, ClassifierNSDE

B = 512
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (B, 784)) * 0.3
y = jax.nn.one_hot(jax.random.randint(key, (B,), 0, 10), 10)

nsde = NeuralSDE(MLP(features=(64, 32)), MLP(features=(32,)),
                 tspan=(0.0, 1.0), solver="sosri", rtol=1.4e-1, atol=1.4e-1,
                 max_steps=64)
clf = ClassifierNSDE(nn.Dense(32), nsde, nn.Dense(10))
p = clf.init(jax.random.PRNGKey(1), x)

def sync(r):
    return float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])

def timeit(fn, *args, n=20):
    r = fn(*args); sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / n * 1e3

# forward only (1 train trajectory)
fwd = jax.jit(lambda p, k: clf(p, x, k, trajectories=1).logits)
print("clf fwd traj=1   %.2f ms" % timeit(fwd, p, key))
# forward eval (10 trajectories)
fwd10 = jax.jit(lambda p, k: clf(p, x, k, trajectories=10, mode="while").logits)
print("clf fwd traj=10  %.2f ms" % timeit(fwd10, p, key))

def loss(p, k):
    out = clf(p, x, k, trajectories=1)
    ce = optax.softmax_cross_entropy(out.logits, y).mean()
    return ce + 10.0 * reg.error_estimate(out.telemetry, agg="mean")
g = jax.jit(jax.grad(loss))
print("clf grad traj=1  %.2f ms" % timeit(g, p, key))

# bare sdeint at the inner shape
from regneuralde_tpu.ops.sde import sdeint
drift_m, diff_m = nsde.drift, nsde.diffusion
z = jax.random.normal(key, (B, 32)) * 0.3
pn = nsde.init(jax.random.PRNGKey(2), z)
out = jax.jit(lambda p, k: nsde(p, z, k).value)
print("sde fwd          %.2f ms" % timeit(out, pn, key))
gs = jax.jit(jax.grad(lambda p, k: jnp.sum(nsde(p, z, k).value ** 2)))
print("sde grad         %.2f ms" % timeit(gs, pn, key))
o = jax.jit(lambda p, k: nsde(p, z, k, mode="while"))(pn, key)
print("nfe1 =", int(o.nfe1), "naccept =", int(o.solution.stats.naccept),
      "nreject =", int(o.solution.stats.nreject))
