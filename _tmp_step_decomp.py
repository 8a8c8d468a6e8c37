"""Where do the non-layer 2.2 ms of the PNA train step go?
Slope protocol (L inner steps in one jit, L=1 vs 4)."""
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
model = canonical_model("pna", "qm9", graphs=graphs)
y = jnp.zeros((b.num_graphs, 1), jnp.float32)
params0 = model.init(jax.random.PRNGKey(0), b)
opt = optax.adam(1e-3)
opt_state0 = opt.init(params0)
n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params0))
print(f"N={b.num_nodes} params={n_params}", flush=True)


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


def mk_grads(L):
    def f(p, o):
        for _ in range(L):
            loss, grads = jax.value_and_grad(loss_wrap)(p)
            p = jax.tree_util.tree_map(lambda a, g: a - 1e-7 * g, p, grads)
        return p, o
    return f


def mk_fwd(L):
    def f(p, o):
        for _ in range(L):
            l = loss_wrap(p)
            p = jax.tree_util.tree_map(lambda a: a * (1.0 + 1e-9 * l), p)
        return p, o
    return f


def mk_adam(L):
    def f(p, o):
        grads = jax.tree_util.tree_map(lambda a: a * 1e-3, p)
        for _ in range(L):
            updates, o = opt.update(grads, o, p)
            p = optax.apply_updates(p, updates)
        return p, o
    return f


slope("full train step      ", mk_full)
slope("grads only (sgd-lite) ", mk_grads)
slope("forward only          ", mk_fwd)
slope("adam update only      ", mk_adam)
print("done", flush=True)
