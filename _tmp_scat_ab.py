"""A/B: committed scatter kernel (rep-concat C) vs 3D-broadcast variant.
In-jit loop slope: time L=1 vs L=7 chained kernel calls inside one jit."""
import importlib.util
import sys

import numpy as np
import jax
import jax.numpy as jnp

from gnnbuilder_tpu.bench.canonical import canonical_batches
from gnnbuilder_tpu.bench.timing import marginal_time
from gnnbuilder_tpu.ops import dispatch
from gnnbuilder_tpu.ops.pallas.scatter_bwd import (
    fused_pna_scatter_backward as f_a,
)

spec = importlib.util.spec_from_file_location(
    "scatter_bwd_v3d", "/tmp/scatter_bwd_v3d.py"
)
mod = importlib.util.module_from_spec(spec)
sys.modules["scatter_bwd_v3d"] = mod
spec.loader.exec_module(mod)
f_b = mod.fused_pna_scatter_backward

graphs, batches = canonical_batches('qm9', n_graphs=1100, batch_size=1024,
                                    node_multiple=512)
b = batches[0]
N = b.num_nodes
F = 128
cfg = dispatch.fused_config(b, kind="layer")
TN, SL = cfg["tile_rows"], cfg["window_slack"]
gm = cfg.get("gather_mode", "split2")
print(f"N={N} W={b.nbr_nodes.shape[1]} TN={TN} SL={SL} gm={gm}", flush=True)

rng = np.random.default_rng(1)
r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
v_loc = r(N, F)
aux0 = jnp.abs(r(N, 5 * F)) + 0.5
agg0 = jnp.abs(r(N, 4 * F)) + 0.1
d_agg0 = r(N, 4 * F)

kw = dict(fwd_gather_mode=gm, tile_rows=TN, window_slack=SL)

da = np.asarray(f_a(d_agg0, aux0, agg0, b.in_degree, b.nbr_nodes, v_loc, **kw))
db = np.asarray(f_b(d_agg0, aux0, agg0, b.in_degree, b.nbr_nodes, v_loc, **kw))
rel = np.max(np.abs(da - db)) / (np.max(np.abs(da)) + 1e-9)
print(f"parity max rel: {rel:.3e}", flush=True)


def slope(f, label, lo=2, hi=14, outer=6):
    def mk(L):
        @jax.jit
        def g(d):
            for _ in range(L):
                dv = f(d, aux0, agg0, b.in_degree, b.nbr_nodes, v_loc, **kw)
                d = d + 1e-7 * jnp.tile(dv, (1, 4))
            return d
        return g
    f_lo, f_hi = mk(lo), mk(hi)
    st = {"lo": d_agg0, "hi": d_agg0}
    def run_lo():
        st["lo"] = f_lo(st["lo"]); return st["lo"]
    def run_hi():
        st["hi"] = f_hi(st["hi"]); return st["hi"]
    run_lo(); run_hi()
    ts = []
    for _ in range(outer):
        tl = marginal_time(run_lo, n_lo=3, n_hi=9, warmup=1, repeats=2)
        th = marginal_time(run_hi, n_lo=3, n_hi=9, warmup=1, repeats=2)
        ts.append((th - tl) / (hi - lo))
    v = float(np.median(ts)) * 1e3; vmin = float(np.min(ts)) * 1e3
    print(f"{label}: med {v:.3f} min {vmin:.3f} ms  ({[f'{t*1e3:.3f}' for t in ts]})", flush=True)


slope(f_a, "A rep-concat  ")
slope(f_b, "B 3D-broadcast")
slope(f_a, "A again       ")
slope(f_b, "B again       ")
