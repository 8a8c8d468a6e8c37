"""XLA-recompute-backward baseline for the >=3x train-step claim.
Same slope protocol as _tmp_step_decomp.py; hand-written backward kernels
disabled (supports_scatter patched off, reverse tables dropped)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

import gnnbuilder_tpu.ops.pallas.scatter_bwd as sb
sb.supports_scatter = lambda *a, **k: False  # force XLA-recompute bwd

from gnnbuilder_tpu import train as gtrain
from gnnbuilder_tpu.bench.canonical import canonical_batches, canonical_model
from gnnbuilder_tpu.bench.timing import marginal_time

graphs, batches = canonical_batches('qm9', n_graphs=1100, batch_size=1024,
                                    node_multiple=256)
b = batches[0].replace(rev_nbr_nodes=None, out_degree=None)
model = canonical_model("pna", "qm9", graphs=graphs)
y = jnp.zeros((b.num_graphs, 1), jnp.float32)
params0 = model.init(jax.random.PRNGKey(0), b)
opt = optax.adam(1e-3)
opt_state0 = opt.init(params0)
print(f"N={b.num_nodes}", flush=True)


def loss_wrap(p):
    pred = model.apply(p, b)
    return gtrain.masked_mse_loss(pred, y, b.graph_mask)


def mk_full(L):
    def f(p, o):
        for _ in range(L):
            loss, grads = jax.value_and_grad(loss_wrap)(p)
            updates, o = opt.update(grads, o, p)
            p = optax.apply_updates(p, updates)
        return p, o
    return f


def slope(label, mk, lo=1, hi=4, outer=5):
    f_lo, f_hi = jax.jit(mk(lo)), jax.jit(mk(hi))
    st = {"lo": (params0, opt_state0), "hi": (params0, opt_state0)}
    def run_lo():
        st["lo"] = f_lo(*st["lo"]); return st["lo"][0]
    def run_hi():
        st["hi"] = f_hi(*st["hi"]); return st["hi"][0]
    run_lo(); run_hi()
    ts = []
    for _ in range(outer):
        tl = marginal_time(run_lo, n_lo=3, n_hi=9, warmup=1, repeats=2)
        th = marginal_time(run_hi, n_lo=3, n_hi=9, warmup=1, repeats=2)
        ts.append((th - tl) / (hi - lo))
    print(f"{label}: med {np.median(ts)*1e3:.3f} ms "
          f"({[f'{t*1e3:.3f}' for t in ts]})", flush=True)


slope("XLA-recompute-bwd train step", mk_full)
print("done", flush=True)
