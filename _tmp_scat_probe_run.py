"""Probe which part of the scatter backward kernel dominates on TPU."""
import importlib.util
import sys

import numpy as np
import jax
import jax.numpy as jnp

from gnnbuilder_tpu.bench.canonical import canonical_batches
from gnnbuilder_tpu.bench.timing import marginal_time
from gnnbuilder_tpu.ops import dispatch

spec = importlib.util.spec_from_file_location(
    "scat_probe", "/tmp/scat_probe.py"
)
mod = importlib.util.module_from_spec(spec)
sys.modules["scat_probe"] = mod
spec.loader.exec_module(mod)
f_p = mod.fused_pna_scatter_backward

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


def slope(probe, tn=None, lo=2, hi=12, outer=5):
    kw = dict(fwd_gather_mode=gm, tile_rows=tn or TN, window_slack=SL,
              probe=probe)
    def mk(L):
        @jax.jit
        def g(d):
            for _ in range(L):
                dv = f_p(d, aux0, agg0, b.in_degree, b.nbr_nodes, v_loc,
                         **kw)
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
    v = float(np.median(ts)) * 1e3
    print(f"{probe:10s} tn={tn or TN}: {v:.3f} ms "
          f"({[f'{t*1e3:.3f}' for t in ts]})", flush=True)


slope("full")
slope("nogather")
slope("noscatter")
slope("nocmp")
slope("noprep")
slope("noacc")
slope("noonehot")
slope("full", tn=640)
print("done", flush=True)
