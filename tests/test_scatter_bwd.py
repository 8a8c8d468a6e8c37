"""Transpose-scatter backward kernel (ops/pallas/scatter_bwd.py) parity.

Two layers of pinning, interpret mode on CPU:

* kernel-level: fused_scatter_backward over the FORWARD table must match
  fused_gather_backward over the reverse table (the round-2 hand-written
  backward, itself pinned to the XLA reference by test_pallas_bwd.py) for
  every term subset and gather mode, on a multi-tile banded batch that
  exercises the margin overlap-add (neighbors crossing tile boundaries),
  pad slots, degree-0 and degree-1 rows.
* layer-level: the full PNA VJP routed through the scatter kernel (scatter
  geometry valid, NO reverse tables supplied) must match jax.grad of the
  XLA reference layer.

Reference counterpart: the reference has no training path (SURVEY.md §1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

F = 128  # scatter kernel is lane-aligned like the forward layer kernels


def _banded(seed, N=512, W=4, SL=16):
    """ELL table with neighbors within +-SL of each row — the windowed
    locality the packed batches guarantee (dispatch.py:165-167)."""
    rng = np.random.default_rng(seed)
    rows = np.arange(N)
    nbr = np.clip(
        rows[:, None] + rng.integers(-SL + 1, SL, size=(N, W)), 0, N - 1
    ).astype(np.int32)
    deg = rng.integers(0, W + 1, size=N).astype(np.int32)
    deg[::37] = 0   # empty rows
    deg[1::41] = 1  # degree-1 rows (exact std cancellation)
    nbr = np.where(np.arange(W)[None, :] < deg[:, None], nbr, 0)
    return nbr, deg, rng


def _reverse(nbr, deg):
    N, W = nbr.shape
    outs = [[] for _ in range(N)]
    for i in range(N):
        for w in range(deg[i]):
            outs[nbr[i, w]].append(i)
    rw = max(max((len(o) for o in outs), default=1), 1)
    rev = np.zeros((N, rw), np.int32)
    od = np.zeros(N, np.int32)
    for j, lst in enumerate(outs):
        od[j] = len(lst)
        rev[j, : len(lst)] = lst
    return rev, od


@pytest.mark.parametrize("mode", ["split2", "bf16", "highest"])
@pytest.mark.parametrize(
    "hl,hd,nc",
    [(True, True, 2), (True, False, 0), (False, True, 0),
     (False, False, 1)],
)
def test_scatter_matches_gather_backward(mode, hl, hd, nc):
    from gnnbuilder_tpu.ops.pallas.ell_bwd import (
        fused_gather_backward,
        transform_like_gather,
    )
    from gnnbuilder_tpu.ops.pallas.scatter_bwd import (
        fused_scatter_backward,
        supports_scatter,
    )

    N, W, SL, TN = 512, 4, 16, 128
    nbr, deg, rng = _banded(3, N=N, W=W, SL=SL)
    rev, od = _reverse(nbr, deg)
    assert supports_scatter(N, TN, SL, F, 7)

    v = rng.standard_normal((N, F)).astype(np.float32)
    vc = np.asarray(transform_like_gather(jnp.asarray(v), mode))
    blocks = []
    if hl:
        blocks.append(rng.standard_normal((N, F)).astype(np.float32) * 0.3)
    if hd:
        ca = rng.standard_normal((N, F)).astype(np.float32) * 0.2
        blocks += [ca, ca * (vc[nbr[:, 0]] * 0.5)]
    for c in range(nc):
        # refs must exist in the gathered s-domain for compares to fire
        blocks += [
            vc[nbr[:, min(c, W - 1)]],
            rng.standard_normal((N, F)).astype(np.float32) * 0.1,
        ]
    cstk = jnp.asarray(np.concatenate(blocks, axis=1))

    kw = dict(v=jnp.asarray(v), has_lin=hl, has_dev=hd, n_cmp=nc,
              fwd_gather_mode=mode, interpret=True)
    ref = fused_gather_backward(
        cstk, jnp.asarray(rev), jnp.asarray(od),
        tile_rows=N, window_slack=0, **kw,
    )
    got = fused_scatter_backward(
        cstk, jnp.asarray(nbr), jnp.asarray(deg),
        tile_rows=TN, window_slack=SL, **kw,
    )
    rel = float(
        jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9)
    )
    assert rel < 1e-4, (mode, hl, hd, nc, rel)


@pytest.mark.parametrize("use_skip,act", [(True, "relu"), (False, None)])
def test_pna_vjp_through_scatter_backward(use_skip, act):
    """Full PNA layer grads via the scatter kernel (no reverse tables) vs
    jax.grad of the XLA reference."""
    from gnnbuilder_tpu.ops.pallas.pna_layer import (
        fused_pna_layer_vjp,
        pna_layer_reference,
    )
    from gnnbuilder_tpu.ops.pallas.scatter_bwd import supports_scatter

    N, W, SL, TN = 512, 4, 16, 128
    nbr, deg, rng = _banded(7, N=N, W=W, SL=SL)
    assert supports_scatter(N, TN, SL, F, 7)

    x = jnp.asarray(rng.standard_normal((N, F)).astype(np.float32))
    r = lambda *s, sc=0.3: jnp.asarray(
        rng.standard_normal(s).astype(np.float32) * sc
    )
    Fout = F
    params = dict(
        w_pre=r(2 * F, F), b_pre=r(F, sc=0.1),
        k_post=r(F + 12 * F, Fout), b_post=r(Fout, sc=0.1),
        w_lin=r(Fout, Fout), b_lin=r(Fout, sc=0.1),
    )
    skip = r(N, Fout, sc=1.0)
    delta = 1.3
    kw = dict(tile_rows=TN, window_slack=SL, interpret=True,
              gather_mode="split2", mm="f32")

    def loss_fused(xx, pp):
        # no rev tables: the VJP must still take the hand-written path
        # via the scatter kernel (pna_layer.fwd's _scatter_ok branch)
        return (fused_pna_layer_vjp(
            xx, jnp.asarray(nbr), jnp.asarray(deg), **pp, delta=delta,
            skip=skip if use_skip else None, act=act, **kw) ** 2).sum()

    def loss_ref(xx, pp):
        return (pna_layer_reference(
            xx, jnp.asarray(nbr), jnp.asarray(deg),
            pp["w_pre"], pp["b_pre"], pp["k_post"], pp["b_post"],
            pp["w_lin"], pp["b_lin"], delta,
            skip=skip if use_skip else None, act=act) ** 2).sum()

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)

    rel = lambda a, b: float(
        jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9)
    )
    # 1e-3 (not the 5e-4 of the F=8 tests): at F=128 the shared split2
    # forward-gather + epilogue-recompute chains accumulate ~6e-4 max-rel
    # regardless of backward kernel (scatter-vs-gather kernel parity is
    # pinned at 1e-4 above; measured identical deviation on both paths)
    assert rel(gx_f, gx_r) < 1e-3
    for k in params:
        assert rel(gp_f[k], gp_r[k]) < 1e-3, k


@pytest.mark.parametrize("mode", ["split2", "highest"])
def test_pna_raw_mode_matches_cstk_path(mode):
    """fused_pna_scatter_backward (epilogue d_agg production + coefficient
    prep fused into the kernel) must match computing d_agg = dy @ ks_t in
    XLA, building cstk, and calling fused_scatter_backward — the in-VMEM
    path uses the same op order (scatter_bwd.py docstring); the d_agg
    matmul itself is a 3-pass hi/lo split (~1e-7 rel vs the XLA f32
    product)."""
    import jax.numpy as jnp

    from gnnbuilder_tpu.ops.pallas.ell_bwd import transform_like_gather
    from gnnbuilder_tpu.ops.pallas.scatter_bwd import (
        fused_pna_scatter_backward,
        fused_scatter_backward,
    )

    N, W, SL, TN = 512, 4, 16, 128
    delta = 2.0
    nbr, deg, rng = _banded(11, N=N, W=W, SL=SL)
    v = rng.standard_normal((N, F)).astype(np.float32)
    vc = np.asarray(transform_like_gather(jnp.asarray(v), mode))

    d_mid = jnp.asarray(
        rng.standard_normal((N, F)).astype(np.float32) * 0.3
    )
    ks_t = jnp.asarray(
        rng.standard_normal((3 * F, 4 * F)).astype(np.float32) * 0.1
    )
    # aux: refs must exist in the gathered s-domain for compares to fire;
    # ties >= 1; agg_cat's std block positive
    aux = jnp.asarray(np.concatenate([
        vc[nbr[:, 0]], vc[nbr[:, min(1, W - 1)]],
        rng.standard_normal((N, F)).astype(np.float32),
        1.0 + rng.integers(1, 3, (N, F)).astype(np.float32),
        1.0 + rng.integers(1, 3, (N, F)).astype(np.float32),
    ], axis=1))
    agg_cat = jnp.asarray(
        rng.standard_normal((N, 4 * F)).astype(np.float32) ** 2 + 0.1
    )
    degj = jnp.asarray(deg)

    # the XLA prep (same formulas as pna_layer.bwd)
    degf = degj.astype(jnp.float32)[:, None]
    denom = jnp.maximum(degf, 1.0)
    ne = degf > 0
    log_deg = jnp.log(denom + 1.0)
    dy = jnp.concatenate(
        [d_mid, (log_deg / delta) * d_mid, (delta / log_deg) * d_mid],
        axis=1,
    )
    d_agg = dy @ ks_t
    ct_mx = jnp.where(ne, d_agg[:, 0:F], 0.0)
    ct_mn = jnp.where(ne, d_agg[:, F : 2 * F], 0.0)
    ct_mean = jnp.where(ne, d_agg[:, 2 * F : 3 * F], 0.0)
    c_lin = ct_mean / denom
    c_a = d_agg[:, 3 * F : 4 * F] / (denom * agg_cat[:, 3 * F : 4 * F])
    c_mx = ct_mx / jnp.maximum(aux[:, 3 * F : 4 * F], 1.0)
    c_mn = ct_mn / jnp.maximum(aux[:, 4 * F : 5 * F], 1.0)
    cstk = jnp.concatenate(
        [c_lin, c_a, c_a * aux[:, 2 * F : 3 * F], aux[:, 0:F], c_mx,
         aux[:, F : 2 * F], c_mn], axis=-1,
    )

    kw = dict(fwd_gather_mode=mode, tile_rows=TN, window_slack=SL,
              interpret=True)
    ref = fused_scatter_backward(
        cstk, jnp.asarray(nbr), degj, v=jnp.asarray(v),
        has_lin=True, has_dev=True, n_cmp=2, **kw,
    )
    got = fused_pna_scatter_backward(
        d_mid, aux, agg_cat, degj, jnp.asarray(nbr), jnp.asarray(v),
        ks_t=ks_t, delta=delta, **kw,
    )
    rel = float(jnp.abs(got - ref).max() / (jnp.abs(ref).max() + 1e-9))
    # near-ulp only: same op ORDER, but the kernel's d_agg is a 3-pass
    # hi/lo split matmul and compiler FMA contraction differs
    assert rel < 2e-5, (mode, rel)


def test_scatter_rejects_bad_geometry():
    from gnnbuilder_tpu.ops.pallas.scatter_bwd import supports_scatter

    assert not supports_scatter(512, 512, 16, F, 7)   # single tile
    assert not supports_scatter(512, 128, 0, F, 7)    # no slack
    assert not supports_scatter(512, 192, 16, F, 7)   # tile % 128
    assert not supports_scatter(512, 128, 96, F, 7)   # TNS < 2*slack
