"""Component slopes at the exact train geometry (N from canonical b1024)."""
import numpy as np
import jax, jax.numpy as jnp
import sys; sys.path.insert(0, '/root/repo')
import gnnbuilder_tpu as gnnb
from gnnbuilder_tpu.bench.canonical import canonical_batches
from gnnbuilder_tpu.bench.timing import marginal_time
from gnnbuilder_tpu.ops import dispatch

graphs, batches = canonical_batches('qm9', n_graphs=1100, batch_size=1024,
                                    node_multiple=512)
batch = batches[0]
N = batch.num_nodes
from gnnbuilder_tpu.ops.pallas.pna_layer import (
    fused_pna_layer, fused_pna_layer_vjp, _pna_epilogue)
from gnnbuilder_tpu.ops.pallas.scatter_bwd import fused_pna_scatter_backward
cfg = dispatch.fused_config(batch, kind="layer")
mm = cfg.pop("mm", "bf16"); gm = cfg.pop("gather_mode", "split2")
TN, SL = cfg["tile_rows"], cfg["window_slack"]
F = 128
print(f"N={N} TN={TN} SL={SL}", flush=True)
rng = np.random.default_rng(1)
r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
x0 = r(N, F)
w_pre, b_pre = r(2*F, F)*0.05, jnp.zeros((F,), jnp.float32)
k_post, b_post = r(13*F, F)*0.05, jnp.zeros((F,), jnp.float32)
w_lin, b_lin = r(F, F)*0.05, jnp.zeros((F,), jnp.float32)
skip = r(N, F)
v_loc = r(N, F)
aux0 = jnp.abs(r(N, 5*F)) + 0.5
agg0 = jnp.abs(r(N, 4*F)) + 0.1

def slope(make_fn, label, lo=1, hi=7, outer=4):
    f_lo, f_hi = jax.jit(make_fn(lo)), jax.jit(make_fn(hi))
    st = {"lo": x0, "hi": x0}
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
    print(f"  {label:34s}: {v:7.3f} ms  ({[f'{t*1e3:.3f}' for t in ts]})", flush=True)
    return v

def mk_vjp(L):
    def f(x):
        for _ in range(L):
            def g(xx):
                out = fused_pna_layer_vjp(
                    xx, batch.nbr_nodes, batch.in_degree,
                    w_pre, b_pre, k_post, b_post, w_lin, b_lin, 2.0,
                    skip=skip, rev_nbr_nodes=batch.rev_nbr_nodes,
                    out_degree=batch.out_degree, gather_mode=gm, mm=mm,
                    act="relu", **cfg)
                return jnp.sum(out * out)
            x = x - 1e-7 * jax.grad(g)(x)
        return x
    return f
slope(mk_vjp, "layer fwd+bwd (hand vjp)")

def mk_fwd_save(L):
    def f(x):
        for _ in range(L):
            out, v, agg_cat, aux = fused_pna_layer(
                x, batch.nbr_nodes, batch.in_degree,
                w_pre, b_pre, k_post, b_post, w_lin, b_lin,
                2.0, skip=skip, gather_mode=gm, mm=mm, act="relu",
                save_res=True, **cfg)
            x = out + 1e-30 * (v + agg_cat[:, :F] + aux[:, :F])
        return x
    return f
slope(mk_fwd_save, "layer fwd (save_res)")

def mk_raw(L):
    def f(x):
        d_agg = jnp.tile(x, (1, 4))
        for _ in range(L):
            dv = fused_pna_scatter_backward(
                d_agg, aux0, agg0, batch.in_degree, batch.nbr_nodes,
                v_loc, fwd_gather_mode=gm, tile_rows=TN, window_slack=SL)
            d_agg = d_agg + 1e-7 * jnp.tile(dv, (1, 4))
        return d_agg[:, :F]
    return f
slope(mk_raw, "raw scatter kernel")

def mk_epi(L):
    def f(x):
        agg_cat = jnp.tile(x, (1, 4))
        ct = jnp.ones((N, F), jnp.float32)
        for _ in range(L):
            _, epi_vjp = jax.vjp(
                lambda ac: _pna_epilogue(x0, ac, batch.in_degree, k_post,
                                         b_post, w_lin, b_lin, skip, 2.0,
                                         "relu", True),
                agg_cat)
            (d_agg,) = epi_vjp(ct)
            agg_cat = agg_cat + 1e-7 * d_agg
        return agg_cat[:, :F]
    return f
slope(mk_epi, "epilogue vjp (XLA)")

def mk_rest(L):
    def f(du):
        x = x0
        for _ in range(L):
            degf = batch.in_degree.astype(jnp.float32)[:, None]
            ne = degf > 0
            ct_mx = jnp.where(ne, du, 0.0)
            ct_mn = jnp.where(ne, du * 0.5, 0.0)
            ct_mean = jnp.where(ne, du * 0.25, 0.0)
            duu = ct_mx + ct_mn + ct_mean
            dv = duu
            w_i, w_j = w_pre[:F], w_pre[F:]
            dx = duu @ w_i.T + dv @ w_j.T
            dw = jnp.concatenate([x.T @ duu, x.T @ dv], axis=0)
            du = du + 1e-7 * dx + 1e-30 * dw.sum()
        return du
    return f
slope(mk_rest, "du/pre_nn chains (XLA)")
print("done", flush=True)
