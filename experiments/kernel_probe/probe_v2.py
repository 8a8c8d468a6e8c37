"""Measure fused PNA layer v2 on the real chip vs the v1 baseline numbers.

Usage: python probe_v2.py [tile_rows] [mm] [gather_mode]
"""
import sys, time
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcomp")
import jax, jax.numpy as jnp, numpy as np
try:
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception as e:
    print("cache cfg:", e)
import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.bench.canonical import canonical_batches
from gnnbuilder_tpu.bench.timing import marginal_time
from gnnbuilder_tpu.ops.pallas.pna_layer import (
    fused_pna_layer, pna_layer_reference, pna_layer_supported,
)

TN = int(sys.argv[1]) if len(sys.argv) > 1 else 512
MM = sys.argv[2] if len(sys.argv) > 2 else "bf16"
GM = sys.argv[3] if len(sys.argv) > 3 else "split2"

graphs, batches = canonical_batches("qm9", n_graphs=2048, batch_size=1024,
                                    node_multiple=max(256, int(sys.argv[1]) if len(sys.argv) > 1 else 512))
b = batches[0]
N = b.num_nodes
W = b.nbr_nodes.shape[1]
F = 128
SL = 32
print(f"N={N} W={W} TN={TN} SL={SL} mm={MM} gm={GM}")
assert pna_layer_supported(N, F, F, TN, SL), "unsupported config"

rng = np.random.default_rng(0)
r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
x = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
w_pre, b_pre = r(2 * F, F), r(F)
k_post, b_post = r(F + 12 * F, F), r(F)
w_lin, b_lin = r(F, F), r(F)

f = jax.jit(lambda xx: fused_pna_layer(
    xx, b.nbr_nodes, b.in_degree, w_pre, b_pre, k_post, b_post,
    w_lin, b_lin, 2.5, tile_rows=TN, window_slack=SL,
    gather_mode=GM, mm=MM, act="relu"))

t0 = time.time()
out = np.asarray(f(x))
print(f"compile+run {time.time()-t0:.1f}s")

if os.environ.get("PROBE_CHECK"):
    ref = np.asarray(jax.nn.relu(pna_layer_reference(
        x, b.nbr_nodes, b.in_degree, w_pre, b_pre, k_post, b_post,
        w_lin, b_lin, 2.5)))
    d = np.abs(out - ref)
    rel = d / (np.abs(ref) + 1e-3)
    print(f"vs XLA-on-TPU: max abs {d.max():.2e}  max rel {rel.max():.2e}")

dt = marginal_time(f, x, n_lo=10, n_hi=40, repeats=5)
print(f"v2 TN={TN} mm={MM} gm={GM}: {dt*1e6:.1f} us/layer (chained, incl ~110us dispatch)")
