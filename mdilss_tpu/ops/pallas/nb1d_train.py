"""Pallas TPU kernels: fused non-bottleneck-1d block for TRAINING.

The training block needs batch-statistics BN (a global reduction mid-block),
so unlike the inference kernel (nb1d.py: one program for the whole block with
folded running-stats BN) the block splits at each BN boundary into two fused
"conv pairs", with the tiny [C]-sized stats/affine math done by XLA between
kernels:

  pair 1:  c1 = relu(rowconv(x, w31a) + b31a)
           y1 = colconv(c1, w13a) (+ x @ rap1)          -> y1, sum/sumsq(y1)
  (XLA)    batch stats of y1 -> per-channel affine (a1, b1)
  pair 2:  m  = relu(a1*y1 + b1)   [rows beyond the image zeroed]
           c3 = relu(rowconv_d(m, w31b) + b31b)
           y2 = colconv_d(c3, w13b) (+ m @ rap2)        -> y2, sum/sumsq(y2)
  (XLA)    stats of y2 -> (a2, b2);  out = relu(dropmask*(a2*y2+b2) + x)

The pre-BN biases (conv1x3_k.b, rap_k.b) are per-channel constants absorbed
exactly by the batch mean, so they are omitted from the kernels: the
normalized output is invariant, their gradients are exactly zero, and only
the RECORDED running mean needs the constant added back (reference torch
semantics; see the wrapper).

The backward splits the same way (see `_bwd_pair_*`): XLA does the BN
backward reductions/elementwise (they fuse well), Pallas does the conv-pair
backward — dgrad + all weight grads in one pass over the tile, with the
relu intermediates (c1 / m / c3) recomputed in VMEM rather than stored.

Convolutions use the same MXU mapping as the inference kernel: kx1 row convs
are one shift-stacked matmul, 1xk col convs three W-shifted matmuls.

Both kernels tile rows with a halo (grid (N, H/tile)); per-channel vectors
ship as (1, C) f32; weight-gradient outputs accumulate across the
sequentially-executed grid into revisited VMEM blocks. v2: C%128==0 blocks
stream their overlapping row windows by double-buffered in-kernel DMA from
the halo-padded HBM array (`_halo_dma`) — no staging pass; other channel
counts fall back to `_overlap_tiles` staging (Mosaic manual DMA requires a
128-aligned lane dim).

STATUS (measured, round 2, step-2 distill bs6 512x1024 bf16+remat on v5e):
v1 205-226 ms/step -> v2 172.9 ms, vs 117.2 ms for the XLA path. The gap is
the pallas/XLA boundary tax (layout-conversion copies + BN glue XLA would
fuse into its own convs); see docs/DESIGN.md "Pallas kernels" for the
control experiments. Kept as an experimental, correctness-verified
reference; the XLA path is the production default.

SINGLE-DEVICE ONLY: pallas_call is not auto-partitioned under a mesh, so the
in-kernel BN batch statistics are per-shard — they cannot reproduce the
sync-BN (global jnp.mean under pjit) semantics of the XLA path. The Trainer
enforces this (train/loop.py rejects fused_train on a >1-device mesh); wrap
via shard_map with explicit psums before lifting that restriction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nb1d import _col_conv, _mm, _row_conv, _stack_col_w, _stack_row_w


def _pick_tile(h: int, w: int, c: int, itemsize: int, budget: int = 1024 * 1024) -> int:
    padded_c = max(c, 128)
    tile_h = max(8, budget // max(w * padded_c * itemsize, 1))
    tile_h = 1 << (tile_h.bit_length() - 1)
    tile_h = min(tile_h, h)
    while h % tile_h:
        tile_h //= 2
    return tile_h


def _halo_dma(hbm_ref, buf, sem, tile_h: int, rows: int, n_tiles: int):
    """Double-buffered halo reads: the kernel streams overlapping row windows
    [s*tile_h, s*tile_h + rows) of a halo-PADDED [N, H + 2*halo, W, C] array
    straight out of HBM, prefetching the next grid step's window while the
    current one computes. This replaces the v1 `_overlap_tiles` staging pass
    (an XLA stack that re-wrote every input ~1.2x to make windows
    BlockSpec-shaped) with zero extra HBM traffic.

    Returns (current_window_value, ()). Call once at kernel top.
    """
    i, s = pl.program_id(0), pl.program_id(1)
    step = i * n_tiles + s

    def dma(slot, ii, ss):
        return pltpu.make_async_copy(
            hbm_ref.at[ii, pl.ds(ss * tile_h, rows)], buf.at[slot], sem.at[slot]
        )

    @pl.when(step == 0)
    def _warm():
        dma(0, i, s).start()

    total = pl.num_programs(0) * n_tiles

    @pl.when(step + 1 < total)
    def _prefetch():
        nstep = step + 1
        dma(jax.lax.rem(nstep, 2), jax.lax.div(nstep, n_tiles),
            jax.lax.rem(nstep, n_tiles)).start()

    slot = jax.lax.rem(step, 2)
    dma(slot, i, s).wait()
    return buf[slot]


def _overlap_tiles(x: jax.Array, tile_h: int, halo: int) -> jax.Array:
    """[N,H,W,C] -> [N, S, tile_h + 2*halo, W, C] overlapping row tiles.

    Fallback staging for C not divisible by 128: Mosaic's manual-DMA path
    requires the minor (lane) dimension of a sliced copy to be 128-aligned,
    so the C=64/16 blocks can't stream halos with `_halo_dma` and instead
    stage BlockSpec-shaped windows in XLA (one extra read+write of the
    input). The C=128 group — where ~80% of the FLOPs and bytes live at
    512x1024 scale — takes the zero-copy DMA path.
    """
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    s = h // tile_h
    return jnp.stack(
        [xp[:, i * tile_h : i * tile_h + tile_h + 2 * halo] for i in range(s)], axis=1
    )


def _row_zero(v, tile_h: int, lead: int, img_h: int, s):
    """Zero rows of `v` (shape [tile_h + 2*lead, W, C]) outside the image."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (v.shape[0], 1, 1), 0) + s * tile_h - lead
    return jnp.where((rows >= 0) & (rows < img_h), v, jnp.zeros_like(v))


# ---------------------------------------------------------------------------
# forward pair
# ---------------------------------------------------------------------------

def _fwd_pair_kernel(
    x_in, w31, b31, w13, rapw, pre_a, pre_b,
    y_ref, stats_ref, xbuf, xsem,
    *, halo: int, d: int, tile_h: int, img_h: int, use_rap: bool, pre: bool,
    n_tiles: int, use_dma: bool,
):
    i, s = pl.program_id(0), pl.program_id(1)
    if use_dma:
        x = _halo_dma(x_in, xbuf, xsem, tile_h, tile_h + 2 * halo, n_tiles)
    else:
        x = x_in[0, 0]
    dt = x.dtype

    if pre:
        # m = relu(a*y1 + b), zero rows beyond the image (torch zero-pads the
        # second pair's input at the boundary)
        x = jnp.maximum(x.astype(jnp.float32) * pre_a[:] + pre_b[:], 0.0).astype(dt)
        x = _row_zero(x, tile_h, halo, img_h, s)

    c = _row_conv(x, w31[:], d, tile_h, halo)
    c = jnp.maximum(c + b31[:].astype(dt), 0).astype(dt)
    y = _col_conv(c, w13[:], d)
    if use_rap:
        xc = x[halo : halo + tile_h]
        y = y + _mm(xc.reshape(-1, xc.shape[-1]), rapw[:]).reshape(y.shape)
    y_ref[0] = y

    yf = y.astype(jnp.float32)
    part = jnp.stack([jnp.sum(yf, axis=(0, 1)), jnp.sum(yf * yf, axis=(0, 1))])

    @pl.when(jnp.logical_and(i == 0, s == 0))
    def _init():
        stats_ref[:] = jnp.zeros_like(stats_ref)

    stats_ref[:] += part


def fwd_pair(
    x: jax.Array,
    w31: jax.Array,  # [3,1,C,C]
    b31: jax.Array,  # [C]
    w13: jax.Array,  # [1,3,C,C]
    rapw: jax.Array | None,  # [C,C] or None
    pre: tuple[jax.Array, jax.Array] | None,  # (a, b) per-channel f32 or None
    *,
    d: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Returns (y [N,H,W,C], stats [2,C] f32 = sum / sumsq of y over N,H,W)."""
    n, h, w, c = x.shape
    dt = x.dtype
    # y rows [0, tile) need c rows [0, tile) only (the col conv is W-only),
    # and the row conv at row r reads input rows r-d..r+d => input halo d.
    halo = d
    tile_h = _pick_tile(h, w, c, x.dtype.itemsize)
    n_tiles = h // tile_h

    # C%128==0: halo-pad once (cheap) and stream overlapping windows by DMA —
    # no staging pass. Other C: stage BlockSpec tiles (see _overlap_tiles).
    use_dma = c % 128 == 0
    if use_dma:
        x_op = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
        x_spec = pl.BlockSpec(memory_space=pl.ANY)
        xbuf_shape = (2, tile_h + 2 * halo, w, c)
    else:
        x_op = _overlap_tiles(x, tile_h, halo)
        x_spec = pl.BlockSpec(
            (1, 1, tile_h + 2 * halo, w, c), lambda i, s: (i, s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        xbuf_shape = (8, 128)  # unused dummy scratch
    w31s = jnp.asarray(_stack_row_w(w31), dt)
    w13s = jnp.asarray(_stack_col_w(w13), dt)
    b31v = b31.astype(jnp.float32).reshape(1, -1)
    rap = rapw is not None
    rapm = jnp.asarray(rapw, dt) if rap else jnp.zeros((c, c), dt)
    if pre is None:
        pa = jnp.zeros((1, c), jnp.float32)
        pb = jnp.zeros((1, c), jnp.float32)
    else:
        pa, pb = pre[0].reshape(1, -1).astype(jnp.float32), pre[1].reshape(1, -1).astype(jnp.float32)

    kernel = functools.partial(
        _fwd_pair_kernel, halo=halo, d=d, tile_h=tile_h, img_h=h,
        use_rap=rap, pre=pre is not None, n_tiles=n_tiles, use_dma=use_dma,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    y, stats = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[x_spec] + [vmem] * 6,
        out_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda i, s: (i, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, c), dt),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(xbuf_shape, dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_op, w31s, b31v, w13s, rapm, pa, pb)
    return y, stats


# ---------------------------------------------------------------------------
# backward pair
# ---------------------------------------------------------------------------

def _wgrad(a2d, b2d):
    """[R, C]^T @ [R, C] -> [C, C] in f32 (MXU reduction matmul)."""
    return jax.lax.dot_general(
        a2d, b2d, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_pair_kernel(
    raw_in, gy_in,
    w31f, b31, w13b, w31b, rapwT, pre_a, pre_b,
    du_ref, dw31_ref, db31_ref, dw13_ref, drap_ref,
    rawbuf, rawsem, gybuf, gysem,
    *, d: int, tile_h: int, img_h: int, use_rap: bool, pre: bool, w: int,
    n_tiles: int, use_dma: bool,
):
    i, s = pl.program_id(0), pl.program_id(1)
    if use_dma:
        u = _halo_dma(raw_in, rawbuf, rawsem, tile_h, tile_h + 4 * d, n_tiles)  # halo 2d
        gy = _halo_dma(gy_in, gybuf, gysem, tile_h, tile_h + 2 * d, n_tiles)  # halo d
    else:
        u = raw_in[0, 0]
        gy = gy_in[0, 0]
    dt = u.dtype
    c_ch = u.shape[-1]

    if pre:
        u = jnp.maximum(u.astype(jnp.float32) * pre_a[:] + pre_b[:], 0.0).astype(dt)
        u = _row_zero(u, tile_h, 2 * d, img_h, s)

    # recompute c on rows [-d, tile+d)  (u buffer rows [-2d, tile+2d))
    rows_c = tile_h + 2 * d
    c = _row_conv(u, w31f[:], d, rows_c, d)
    c = jnp.maximum(c + b31[:].astype(dt), 0).astype(dt)

    # dc = colconv^T(gy) * [c > 0], zeroed outside the image
    # (the compare runs in f32: Mosaic on this libtpu rejects bf16 cmpf)
    dc = _col_conv(gy, w13b[:], d)
    dc = jnp.where(c.astype(jnp.float32) > 0, dc, jnp.zeros_like(dc)).astype(dt)
    dc = _row_zero(dc, tile_h, d, img_h, s)

    # du (w.r.t. the pair input u, post-pre-stage) on center rows
    du = _row_conv(dc, w31b[:], d, tile_h, d)
    gy_c = gy[d : d + tile_h]
    if use_rap:
        du = du + _mm(gy_c.reshape(-1, c_ch), rapwT[:]).reshape(du.shape)
    du_ref[0] = du.astype(dt)

    # ---- accumulated weight grads (center rows only) ----
    @pl.when(jnp.logical_and(i == 0, s == 0))
    def _init():
        dw31_ref[:] = jnp.zeros_like(dw31_ref)
        db31_ref[:] = jnp.zeros_like(db31_ref)
        dw13_ref[:] = jnp.zeros_like(dw13_ref)
        drap_ref[:] = jnp.zeros_like(drap_ref)

    dc_c = dc[d : d + tile_h]
    gy2d = gy_c.reshape(-1, c_ch)
    dc2d = dc_c.reshape(-1, c_ch)

    # dw13[k] = sum_w c[w + (k-1)d]^T gy[w] ; c center rows, W-shifted, 0-pad
    c_cen = c[d : d + tile_h]
    zeros = jnp.zeros((tile_h, d, c_ch), dt)
    cp = jnp.concatenate([zeros, c_cen, zeros], axis=1)
    dw13 = jnp.stack([
        _wgrad(cp[:, k * d : k * d + w].reshape(-1, c_ch), gy2d) for k in range(3)
    ])
    dw13_ref[:] += dw13

    # dw31[k] = sum_r u[r + (k-1)d]^T dc[r] ; u buffer rows [-2d, tile+2d)
    dw31 = jnp.stack([
        _wgrad(u[d + k * d : d + k * d + tile_h].reshape(-1, c_ch), dc2d)
        for k in range(3)
    ])
    dw31_ref[:] += dw31
    db31_ref[:] += jnp.sum(dc_c.astype(jnp.float32), axis=(0, 1)).reshape(1, -1)
    if use_rap:
        drap_ref[:] += _wgrad(u[2 * d : 2 * d + tile_h].reshape(-1, c_ch), gy2d)


def bwd_pair(
    raw: jax.Array,
    g_y: jax.Array,
    w31: jax.Array,
    b31: jax.Array,
    w13: jax.Array,
    rapw: jax.Array | None,
    pre: tuple[jax.Array, jax.Array] | None,
    *,
    d: int,
    interpret: bool = False,
):
    """Backward of `fwd_pair` w.r.t. its POST-pre-stage input u and weights.

    Returns (du [N,H,W,C], dw31 [3,1,C,C], db31 [C], dw13 [1,3,C,C],
    drap [C,C] or None). The pre-stage (BN affine) backward — which needs
    global batch-stat reductions — is the caller's (XLA's) job, consuming du.
    """
    n, h, w, c = raw.shape
    dt = raw.dtype
    tile_h = _pick_tile(h, w, c, raw.dtype.itemsize, budget=512 * 1024)
    n_tiles = h // tile_h

    use_dma = c % 128 == 0
    if use_dma:
        raw_op = jnp.pad(raw, ((0, 0), (2 * d, 2 * d), (0, 0), (0, 0)))
        gy_op = jnp.pad(g_y, ((0, 0), (d, d), (0, 0), (0, 0)))
        raw_spec = gy_spec = pl.BlockSpec(memory_space=pl.ANY)
        rawbuf_shape = (2, tile_h + 4 * d, w, c)
        gybuf_shape = (2, tile_h + 2 * d, w, c)
    else:
        raw_op = _overlap_tiles(raw, tile_h, 2 * d)
        gy_op = _overlap_tiles(g_y, tile_h, d)
        raw_spec = pl.BlockSpec(
            (1, 1, tile_h + 4 * d, w, c), lambda i, s: (i, s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        gy_spec = pl.BlockSpec(
            (1, 1, tile_h + 2 * d, w, c), lambda i, s: (i, s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        rawbuf_shape = gybuf_shape = (8, 128)  # unused dummy scratch

    w31f = jnp.asarray(_stack_row_w(w31), dt)
    b31v = b31.astype(jnp.float32).reshape(1, -1)
    # transposed, tap-reversed stacks for the dgrads
    w13bT = jnp.concatenate([w13[0, 2].T, w13[0, 1].T, w13[0, 0].T], axis=0).astype(dt)
    w31bT = jnp.concatenate([w31[2, 0].T, w31[1, 0].T, w31[0, 0].T], axis=0).astype(dt)
    rap = rapw is not None
    rapT = jnp.asarray(rapw.T, dt) if rap else jnp.zeros((c, c), dt)
    if pre is None:
        pa = jnp.zeros((1, c), jnp.float32)
        pb = jnp.zeros((1, c), jnp.float32)
    else:
        pa, pb = pre[0].reshape(1, -1).astype(jnp.float32), pre[1].reshape(1, -1).astype(jnp.float32)

    kernel = functools.partial(
        _bwd_pair_kernel, d=d, tile_h=tile_h, img_h=h, use_rap=rap,
        pre=pre is not None, w=w, n_tiles=n_tiles, use_dma=use_dma,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda i, s: (0,) * len(shape), memory_space=pltpu.VMEM)
    du, dw31, db31, dw13, drap = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[raw_spec, gy_spec] + [vmem] * 7,
        out_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda i, s: (i, s, 0, 0),
                         memory_space=pltpu.VMEM),
            acc((3, c, c)), acc((1, c)), acc((3, c, c)), acc((c, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, c), dt),
            jax.ShapeDtypeStruct((3, c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((3, c, c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(rawbuf_shape, dt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM(gybuf_shape, dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(raw_op, gy_op, w31f, b31v, w13bT, w31bT, rapT, pa, pb)
    dw31_o = dw31.reshape(3, 1, c, c)
    dw13_o = dw13.reshape(1, 3, c, c)
    return (
        du,
        dw31_o, db31.reshape(c), dw13_o,
        drap if rap else None,
    )


# ---------------------------------------------------------------------------
# full training block (custom VJP)
# ---------------------------------------------------------------------------

def make_nb1d_train(*, d: int, use_rap: bool, eps: float = 1e-3, interpret: bool = False):
    """Build the fused training block:

      f(x, w31a, b31a, w13a, rap1w, g1, be1,
           w31b, b31b, w13b, rap2w, g2, be2, mask_scaled)
        -> (out, mu1, var1, mu2, var2)

    * mask_scaled: [N,1,1,C] dropout keep-mask pre-scaled by 1/keep (constant
      — its cotangent is zero), or ones.
    * returned mu/var are the BATCH stats of the pre-BN activations WITHOUT
      the conv1x3/rap biases (those per-channel constants are absorbed by the
      mean; callers add them back when updating torch-parity running means).
    * rap1w/rap2w are ignored when use_rap=False (pass zeros; grads are zero).
    """

    def stats(st, m_count):
        mu = st[0] / m_count
        var = jnp.maximum(st[1] / m_count - mu * mu, 0.0)
        return mu, var

    def fwd_primal(x, w31a, b31a, w13a, rap1w, g1, be1,
                   w31b, b31b, w13b, rap2w, g2, be2, mask_scaled):
        n, h, w, c = x.shape
        m_count = n * h * w
        r1 = rap1w if use_rap else None
        r2 = rap2w if use_rap else None
        y1, st1 = fwd_pair(x, w31a, b31a, w13a, r1, None, d=1, interpret=interpret)
        mu1, var1 = stats(st1, m_count)
        inv1 = jax.lax.rsqrt(var1 + eps)
        a1 = (g1 * inv1).astype(jnp.float32)
        b1 = (be1 - mu1 * g1 * inv1).astype(jnp.float32)
        y2, st2 = fwd_pair(y1, w31b, b31b, w13b, r2, (a1, b1), d=d, interpret=interpret)
        mu2, var2 = stats(st2, m_count)
        inv2 = jax.lax.rsqrt(var2 + eps)
        z2 = y2.astype(jnp.float32) * (g2 * inv2) + (be2 - mu2 * g2 * inv2)
        out = jnp.maximum(z2 * mask_scaled.astype(jnp.float32) + x.astype(jnp.float32), 0.0).astype(x.dtype)
        return out, (y1, y2, mu1, inv1, a1, b1, mu2, inv2)

    @jax.custom_vjp
    def block(x, w31a, b31a, w13a, rap1w, g1, be1,
              w31b, b31b, w13b, rap2w, g2, be2, mask_scaled):
        out, res = fwd_primal(x, w31a, b31a, w13a, rap1w, g1, be1,
                              w31b, b31b, w13b, rap2w, g2, be2, mask_scaled)
        y1, y2, mu1, inv1, a1, b1, mu2, inv2 = res
        var1 = 1.0 / (inv1 * inv1) - eps
        var2 = 1.0 / (inv2 * inv2) - eps
        return out, mu1, var1, mu2, var2

    def block_fwd(x, w31a, b31a, w13a, rap1w, g1, be1,
                  w31b, b31b, w13b, rap2w, g2, be2, mask_scaled):
        out, res = fwd_primal(x, w31a, b31a, w13a, rap1w, g1, be1,
                              w31b, b31b, w13b, rap2w, g2, be2, mask_scaled)
        y1, y2, mu1, inv1, a1, b1, mu2, inv2 = res
        var1 = 1.0 / (inv1 * inv1) - eps
        var2 = 1.0 / (inv2 * inv2) - eps
        saved = (x, y1, y2, out, mu1, inv1, a1, b1, mu2, inv2,
                 w31a, b31a, w13a, rap1w, g1,
                 w31b, b31b, w13b, rap2w, g2, mask_scaled)
        return (out, mu1, var1, mu2, var2), saved

    def block_bwd(saved, cts):
        (x, y1, y2, out, mu1, inv1, a1, b1, mu2, inv2,
         w31a, b31a, w13a, rap1w, g1,
         w31b, b31b, w13b, rap2w, g2, mask_scaled) = saved
        g = cts[0].astype(jnp.float32)  # stats cotangents are zero (buffers)
        n, h, w, c = x.shape
        m_count = n * h * w
        r1 = rap1w if use_rap else None
        r2 = rap2w if use_rap else None

        g_f = jnp.where(out > 0, g, 0.0)
        g_z2 = g_f * mask_scaled.astype(jnp.float32)
        yhat2 = (y2.astype(jnp.float32) - mu2) * inv2
        dbe2 = jnp.sum(g_z2, axis=(0, 1, 2))
        dg2 = jnp.sum(g_z2 * yhat2, axis=(0, 1, 2))
        g_y2 = ((g2 * inv2) * (g_z2 - dbe2 / m_count - yhat2 * (dg2 / m_count))).astype(x.dtype)

        dm, dw31b, db31b, dw13b, drap2 = bwd_pair(
            y1, g_y2, w31b, b31b, w13b, r2, (a1, b1), d=d, interpret=interpret
        )

        z1 = y1.astype(jnp.float32) * a1 + b1
        g_z1 = jnp.where(z1 > 0, dm.astype(jnp.float32), 0.0)
        yhat1 = (y1.astype(jnp.float32) - mu1) * inv1
        dbe1 = jnp.sum(g_z1, axis=(0, 1, 2))
        dg1 = jnp.sum(g_z1 * yhat1, axis=(0, 1, 2))
        g_y1 = ((g1 * inv1) * (g_z1 - dbe1 / m_count - yhat1 * (dg1 / m_count))).astype(x.dtype)

        dx_c, dw31a, db31a, dw13a, drap1 = bwd_pair(
            x, g_y1, w31a, b31a, w13a, r1, None, d=1, interpret=interpret
        )
        dx = (g_f + dx_c.astype(jnp.float32)).astype(x.dtype)

        zc = jnp.zeros((c, c), jnp.float32)
        return (
            dx,
            dw31a.astype(w31a.dtype), db31a.astype(b31a.dtype), dw13a.astype(w13a.dtype),
            (drap1 if use_rap else zc).reshape(rap1w.shape).astype(rap1w.dtype),
            dg1.astype(g1.dtype), dbe1.astype(g1.dtype),
            dw31b.astype(w31b.dtype), db31b.astype(b31b.dtype), dw13b.astype(w13b.dtype),
            (drap2 if use_rap else zc).reshape(rap2w.shape).astype(rap2w.dtype),
            dg2.astype(g2.dtype), dbe2.astype(g2.dtype),
            jnp.zeros_like(mask_scaled),
        )

    block.defvjp(block_fwd, block_bwd)
    return block
