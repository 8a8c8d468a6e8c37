"""Localize the on-hardware GAT backward parity failure (tpu_verify.py
reported backward gat worst rel=1.6 while interpret-mode CPU tests pass).

Three levels, each isolating a different suspect:

A. model-level: per-parameter-leaf rel error of the fused-dispatch grads
   vs the all-XLA grads (which leaf carries the O(1) error?).
B. kernel-level: fused_gat_scatter_backward on real Mosaic vs a plain-jnp
   reference fed the IDENTICAL inputs (h/a_src/a_dst/m/den computed once
   in XLA).  A mismatch here = the kernel computes its math wrong on
   hardware; agreement = the kernel is fine and the bug is upstream.
C. consistency: forward-saved softmax stats (save_res=True, on hardware)
   vs XLA-recomputed stats from the same weights — quantifies the
   forward-kernel-vs-XLA-recompute logit drift the backward is exposed to.

Run on the chip (nohup, serialized with other TPU jobs).
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np

import jax
import jax.numpy as jnp

from gnnbuilder_tpu.bench.canonical import canonical_batches, canonical_model
from gnnbuilder_tpu.ops import dispatch

REPORT = {}


def scatter_reference(dz, h, a_src, a_dst, m, den, nbr, deg, heads,
                      neg_slope=0.2):
    """Plain-jnp mirror of fused_gat_scatter_backward's contract."""
    N, HC = dz.shape
    H = heads
    C = HC // H
    W = nbr.shape[1]
    hg = h[nbr].reshape(N, W, H, C)
    asg = a_src[nbr]                                   # [N, W, H]
    pre = asg + a_dst[:, None, :]
    lr = jnp.where(pre >= 0, pre, neg_slope * pre)
    valid = (jnp.arange(W)[None, :] < deg[:, None])[..., None]
    e = jnp.where(valid, jnp.exp(lr - m[:, None, :]), 0.0)
    den_c = jnp.maximum(den, 1e-16)
    alpha = e / den_c[:, None, :]
    dz_h = dz.reshape(N, H, C)
    dalpha = jnp.einsum("nhc,nwhc->nwh", dz_h, hg)
    pre_s = a_src + a_dst
    lr_s = jnp.where(pre_s >= 0, pre_s, neg_slope * pre_s)
    alpha_s = jnp.exp(lr_s - m) / den_c
    dalpha_s = jnp.einsum("nhc,nhc->nh", dz_h, h.reshape(N, H, C))
    s = (alpha * dalpha).sum(1) + alpha_s * dalpha_s
    dpre = alpha * (dalpha - s[:, None, :]) * jnp.where(
        pre >= 0, 1.0, neg_slope)
    dsum = dpre.sum(1)
    flat = nbr.reshape(-1)
    contrib_v = (alpha[..., None] * dz_h[:, None]).reshape(N * W, HC)
    dv = jax.ops.segment_sum(contrib_v, flat, num_segments=N)
    da = jax.ops.segment_sum(dpre.reshape(N * W, H), flat, num_segments=N)
    return dv, da, dsum, s


def banded(seed, N=512, W=4, SL=16):
    rng = np.random.default_rng(seed)
    nbr = np.zeros((N, W), np.int32)
    deg = rng.integers(0, W + 1, size=N).astype(np.int32)
    deg[rng.random(N) < 0.05] = 0
    for i in range(N):
        lo, hi = max(0, i - SL), min(N - 1, i + SL)
        nbr[i, : deg[i]] = rng.integers(lo, hi + 1, size=deg[i])
    return nbr, deg, rng


def part_a():
    print("== A: model-level per-leaf ==", flush=True)
    graphs, batches = canonical_batches(
        "qm9", n_graphs=512, batch_size=256, node_multiple=256)
    b = batches[0]
    model = canonical_model("gat", "qm9", graphs=graphs)
    params = model.init(jax.random.PRNGKey(0), b)

    def loss(p):
        out = model.apply(p, b)
        return (out * out).sum()

    dispatch.set_fused_mode("never")
    g_ref = jax.jit(jax.grad(loss))(params)
    dispatch.set_fused_mode("auto")
    g_fused = jax.jit(jax.grad(loss))(params)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    flat_r = jax.tree.leaves(g_ref)
    rows = []
    for (path, a), r in zip(flat_f, flat_r):
        a, r = np.asarray(a), np.asarray(r)
        rel = float(np.abs(a - r).max() / (np.abs(r).max() + 1e-9))
        rows.append((rel, jax.tree_util.keystr(path), a.shape))
    rows.sort(reverse=True)
    for rel, name, shape in rows[:12]:
        print(f"  {rel:10.3e}  {name} {shape}", flush=True)
    REPORT["model_leaves"] = [
        {"rel": r, "leaf": n} for r, n, _ in rows[:12]]


def part_bc():
    from gnnbuilder_tpu.ops.pallas.gat_bwd import fused_gat_scatter_backward
    from gnnbuilder_tpu.ops.pallas.gat_layer import (
        _head_matrices, fused_gat_layer)

    N, W, SL, TN = 512, 4, 16, 128
    for heads, C in [(1, 128), (4, 32)]:
        HC = heads * C
        nbr, deg, rng = banded(11, N=N, W=W, SL=SL)
        x = rng.standard_normal((N, 128)).astype(np.float32)
        w = rng.standard_normal((128, HC)).astype(np.float32) * 0.3
        att_src = rng.standard_normal((1, heads, C)).astype(np.float32) * .3
        att_dst = rng.standard_normal((1, heads, C)).astype(np.float32) * .3
        bias = np.zeros((HC,), np.float32)
        dz = rng.standard_normal((N, HC)).astype(np.float32)

        hi = jax.lax.Precision.HIGHEST
        h = jnp.dot(jnp.asarray(x), jnp.asarray(w), precision=hi)
        a_s, a_d, _ = _head_matrices(
            jnp.asarray(att_src), jnp.asarray(att_dst), heads, C)
        a_src = jnp.dot(h, a_s, precision=hi)
        a_dst = jnp.dot(h, a_d, precision=hi)
        # XLA-side softmax stats (the kernel contract's m/den inputs)
        pre = a_src[jnp.asarray(nbr)] + a_dst[:, None, :]
        lr = jnp.where(pre >= 0, pre, 0.2 * pre)
        valid = (jnp.arange(W)[None, :] < jnp.asarray(deg)[:, None])[..., None]
        pre_s = a_src + a_dst
        lr_s = jnp.where(pre_s >= 0, pre_s, 0.2 * pre_s)
        m = jnp.maximum(
            jnp.where(valid, lr, -1e30).max(1), lr_s)
        den = jnp.where(valid, jnp.exp(lr - m[:, None, :]), 0.0).sum(1) \
            + jnp.exp(lr_s - m)

        ref_args = (dz, np.asarray(h), np.asarray(a_src), np.asarray(a_dst),
                    np.asarray(m), np.asarray(den), nbr, deg)
        ref = [np.asarray(o) for o in scatter_reference(
            *[jnp.asarray(a) for a in ref_args], heads)]
        ref += [np.asarray(m), np.asarray(den)]
        got = [np.asarray(o) for o in fused_gat_scatter_backward(
            jnp.asarray(dz), h, a_src, a_dst,
            jnp.asarray(nbr), jnp.asarray(deg), heads,
            tile_rows=TN, window_slack=SL)]
        names = ("dh_val", "da_src_nbr", "dsum", "s", "m", "den")
        ent = {}
        for name, g, r in zip(names, got, ref):
            rel = float(np.abs(g - r).max() / (np.abs(r).max() + 1e-9))
            ent[name] = rel
            print(f"  B h{heads}c{C} {name}: rel={rel:.3e}", flush=True)
        REPORT[f"kernel_h{heads}c{C}"] = ent

        # C: forward-saved stats vs the XLA stats above
        out, m_f, den_f = fused_gat_layer(
            jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(deg),
            jnp.asarray(w), jnp.asarray(att_src), jnp.asarray(att_dst),
            jnp.asarray(bias), heads,
            tile_rows=TN, window_slack=SL, save_res=True,
            gather_mode="split2", mm="f32")
        dm = float(np.abs(np.asarray(m_f) - np.asarray(m)).max())
        dd = float(np.abs(np.asarray(den_f) - np.asarray(den)).max()
                   / (np.abs(np.asarray(den)).max() + 1e-9))
        print(f"  C h{heads}c{C}: |m_fwd-m_xla|max={dm:.3e} "
              f"den rel={dd:.3e}", flush=True)
        REPORT[f"stats_h{heads}c{C}"] = {"dm": dm, "den_rel": dd}


def main():
    assert jax.default_backend() == "tpu", jax.devices()
    part_a()
    part_bc()
    with open("results_tpu/gat_bwd_debug.json", "w") as f:
        json.dump(REPORT, f, indent=1)
    print("wrote results_tpu/gat_bwd_debug.json", flush=True)


if __name__ == "__main__":
    main()
