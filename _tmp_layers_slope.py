"""True per-layer train cost: full-grads slope across gnn_num_layers 2 vs 6.
Fixed overhead = step(L=6) - 4*per_layer - ... solved from two points."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu import train as gtrain
from gnnbuilder_tpu.bench.canonical import canonical_batches, canonical_model
from gnnbuilder_tpu.bench.timing import marginal_time

graphs, batches = canonical_batches('qm9', n_graphs=1100, batch_size=1024,
                                    node_multiple=256)
b = batches[0]
y = jnp.zeros((b.num_graphs, 1), jnp.float32)
opt = optax.adam(1e-3)
print(f"N={b.num_nodes}", flush=True)


def step_time(num_layers, outer=5):
    model = canonical_model("pna", "qm9", graphs=graphs)
    model = model.clone(gnn_num_layers=num_layers)
    params0 = model.init(jax.random.PRNGKey(0), b)
    opt_state0 = opt.init(params0)

    def loss_wrap(p):
        pred = model.apply(p, b)
        return gtrain.masked_mse_loss(pred, y, b.graph_mask)

    def mk(L):
        def f(p, o):
            for _ in range(L):
                loss, grads = jax.value_and_grad(loss_wrap)(p)
                updates, o = opt.update(grads, o, p)
                p = optax.apply_updates(p, updates)
            return p, o
        return f

    f_lo, f_hi = jax.jit(mk(1)), jax.jit(mk(4))
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
        ts.append((th - tl) / 3)
    v = float(np.median(ts))
    print(f"L={num_layers}: {v*1e3:.3f} ms "
          f"({[f'{t*1e3:.3f}' for t in ts]})", flush=True)
    return v


t2 = step_time(2)
t6 = step_time(6)
per = (t6 - t2) / 4
print(f"per-layer fwd+bwd: {per*1e3:.3f} ms; fixed overhead "
      f"(embed/pool/mlp/loss/adam): {(t2 - 2*per)*1e3:.3f} ms", flush=True)
