"""Hand-written GAT backward (ops/pallas/gat_bwd.py) gradient parity.

The fused GAT layer's custom VJP routes through the forward-table scatter
kernel whenever its geometry holds (gat_layer._make_vjp_fn._scatter_ok);
this pins jax.grad through that path against jax.grad of the XLA
reference layer, interpret mode on CPU, on a multi-tile banded batch that
exercises margins, pad slots, empty rows, and multi-head reductions.

GAT's backward is smooth (softmax — no extrema-tie routing), so the
contract is float-level agreement, not bit-exactness: rtol 2e-4.
Reference counterpart: none (GAT is the reference's `// TODO`,
gnn_builder_lib.h:2343, and it has no training path at all).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_scatter_bwd import _banded

N, W, SL, TN = 512, 4, 16, 128


def _params(rng, fin, heads, c):
    hc = heads * c
    w = rng.standard_normal((fin, hc)).astype(np.float32) * 0.3
    att_src = rng.standard_normal((1, heads, c)).astype(np.float32) * 0.3
    att_dst = rng.standard_normal((1, heads, c)).astype(np.float32) * 0.3
    bias = rng.standard_normal((hc,)).astype(np.float32) * 0.1
    return w, att_src, att_dst, bias


@pytest.mark.parametrize("heads,c", [(1, 128), (4, 32)])
@pytest.mark.parametrize("act", [None, "relu", "tanh"])
def test_gat_scatter_backward_matches_reference(heads, c, act):
    from gnnbuilder_tpu.ops.pallas.gat_bwd import supports_gat_scatter
    from gnnbuilder_tpu.ops.pallas.gat_layer import (
        fused_gat_layer_vjp,
        gat_layer_reference,
    )

    hc = heads * c
    assert supports_gat_scatter(N, TN, SL, hc, heads, W)

    nbr, deg, rng = _banded(11, N=N, W=W, SL=SL)
    fin = 128
    x = rng.standard_normal((N, fin)).astype(np.float32)
    skip = rng.standard_normal((N, hc)).astype(np.float32) * 0.2
    w, att_src, att_dst, bias = _params(rng, fin, heads, c)
    nbr_j = jnp.asarray(nbr)
    deg_j = jnp.asarray(deg)
    ct = rng.standard_normal((N, hc)).astype(np.float32)

    def loss_fused(x_, sk_, w_, as_, ad_, b_):
        out = fused_gat_layer_vjp(
            x_, nbr_j, deg_j, w_, as_, ad_, b_, heads,
            neg_slope=0.2, self_loops=True, skip=sk_,
            tile_rows=TN, window_slack=SL, interpret=True,
            gather_mode="split2", mm="f32", act=act,
        )
        return jnp.sum(out * ct)

    def loss_ref(x_, sk_, w_, as_, ad_, b_):
        out = gat_layer_reference(
            x_, nbr_j, deg_j, w_, as_, ad_, b_, heads,
            neg_slope=0.2, self_loops=True, skip=sk_, act=act,
        )
        return jnp.sum(out * ct)

    args = (x, skip, w, att_src, att_dst, bias)
    gf = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)

    names = ("dx", "dskip", "dw", "datt_src", "datt_dst", "dbias")
    for name, a, b in zip(names, gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.abs(b).max()), 1e-6)
        dev = float(np.abs(a - b).max()) / scale
        assert dev < 2e-4, f"{name}: rel dev {dev}"


def test_scatter_gate_uses_real_ell_width():
    """Regression: the fwd gate must evaluate supports_gat_scatter with the
    batch's REAL ELL width.  A wide table (W=64 blows the VMEM estimate)
    must fall back to the XLA-recompute branch — not commit to save_res and
    then raise inside fused_gat_scatter_backward at backward trace time —
    and the fallback gradients must still match the reference."""
    from gnnbuilder_tpu.ops.pallas import gat_bwd
    from gnnbuilder_tpu.ops.pallas.gat_layer import (
        fused_gat_layer_vjp,
        gat_layer_reference,
    )

    WIDE = 64
    assert not gat_bwd.supports_gat_scatter(N, TN, SL, 128, 1, WIDE)
    # heads > 128 overflows the padded logit lane block -> rejected
    assert not gat_bwd.supports_gat_scatter(N, TN, SL, 256, 256, 4)

    nbr, deg, rng = _banded(7, N=N, W=W, SL=SL)
    # same batch, wider table: pad slots (>= deg) are ignored by both paths
    nbr_wide = np.zeros((N, WIDE), np.int32)
    nbr_wide[:, :W] = nbr
    x = rng.standard_normal((N, 128)).astype(np.float32)
    w, att_src, att_dst, bias = _params(rng, 128, 1, 128)
    ct = rng.standard_normal((N, 128)).astype(np.float32)

    calls = []
    orig = gat_bwd.fused_gat_scatter_backward
    gat_bwd.fused_gat_scatter_backward = (
        lambda *a, **k: calls.append(1) or orig(*a, **k)
    )
    try:
        gx = jax.grad(
            lambda x_: jnp.sum(ct * fused_gat_layer_vjp(
                x_, jnp.asarray(nbr_wide), jnp.asarray(deg),
                w, att_src, att_dst, bias, 1,
                tile_rows=TN, window_slack=SL, interpret=True, mm="f32",
            ))
        )(x)
    finally:
        gat_bwd.fused_gat_scatter_backward = orig
    assert not calls, "wide-W batch must not take the scatter backward"

    gr = jax.grad(
        lambda x_: jnp.sum(ct * gat_layer_reference(
            x_, jnp.asarray(nbr), jnp.asarray(deg),
            w, att_src, att_dst, bias, 1,
        ))
    )(x)
    dev = float(np.abs(np.asarray(gx) - np.asarray(gr)).max())
    scale = max(float(np.abs(np.asarray(gr)).max()), 1e-6)
    assert dev / scale < 2e-4


def test_gat_scatter_path_is_taken():
    """The VJP must actually route through the scatter kernel for this
    geometry (guards against the gate silently falling back to the
    XLA-recompute branch)."""
    from gnnbuilder_tpu.ops.pallas import gat_bwd
    from gnnbuilder_tpu.ops.pallas.gat_layer import fused_gat_layer_vjp

    nbr, deg, rng = _banded(5, N=N, W=W, SL=SL)
    x = rng.standard_normal((N, 128)).astype(np.float32)
    w, att_src, att_dst, bias = _params(rng, 128, 1, 128)

    calls = []
    orig = gat_bwd.fused_gat_scatter_backward

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    gat_bwd.fused_gat_scatter_backward = spy
    try:
        jax.grad(
            lambda x_: jnp.sum(
                fused_gat_layer_vjp(
                    x_, jnp.asarray(nbr), jnp.asarray(deg),
                    w, att_src, att_dst, bias, 1,
                    tile_rows=TN, window_slack=SL, interpret=True,
                    mm="f32",
                )
            )
        )(x)
    finally:
        gat_bwd.fused_gat_scatter_backward = orig
    assert calls, "scatter backward was not invoked"
