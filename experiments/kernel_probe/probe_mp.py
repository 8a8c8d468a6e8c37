"""Measure the generic fused MP layer (GIN/SAGE/GCN) on the real chip.

Usage: python probe_mp.py <conv> [tile_rows]
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")
import jax, jax.numpy as jnp, numpy as np
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception as e:
    print("cache cfg:", e)
import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.bench.canonical import canonical_batches
from gnnbuilder_tpu.bench.timing import marginal_time
from gnnbuilder_tpu.ops.pallas.mp_layer import fused_mp_layer, mp_layer_reference

CONV = sys.argv[1] if len(sys.argv) > 1 else "gin"
TN = int(sys.argv[2]) if len(sys.argv) > 2 else 512

graphs, batches = canonical_batches("qm9", n_graphs=2048, batch_size=1024,
                                    node_multiple=max(256, TN))
b = batches[0]
N = b.num_nodes
F = 128
SL = 32
print(f"conv={CONV} N={N} TN={TN}", flush=True)

rng = np.random.default_rng(0)
r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
v = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
if CONV == "gin":
    p = dict(w0=r(F, F), b0=r(F), w1=r(F, F), b1=r(F), eps=0.1)
elif CONV == "sage":
    p = dict(w0=r(F, F), b0=r(F), w1=r(F, F))
else:
    p = dict(b0=r(F))

f = jax.jit(lambda xx: fused_mp_layer(
    xx, b.nbr_nodes, b.in_degree, CONV, **p,
    tile_rows=TN, window_slack=SL, gather_mode="split2", mm="bf16",
    act="relu"))
t0 = time.time()
out = np.asarray(f(v))
print(f"compile+run {time.time()-t0:.1f}s", flush=True)

if os.environ.get("PROBE_CHECK"):
    ref = np.asarray(mp_layer_reference(v, b.nbr_nodes, b.in_degree, CONV,
                                        **p, act="relu"))
    d = np.abs(out - ref)
    print(f"vs XLA-on-TPU: max abs {d.max():.2e}")

dt = marginal_time(f, v, n_lo=10, n_hi=40, repeats=5)
print(f"mp {CONV} TN={TN}: {dt*1e6:.1f} us/layer (chained, incl ~110us dispatch)")
