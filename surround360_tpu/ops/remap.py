"""Gather-based image remap (the cv::remap workhorse of the reference).

Every stage of the reference pipeline funnels through `cv::remap` with
bicubic interpolation (ImageWarper.cpp:95-174, NovelView.cpp:174-224,
TestRenderStereoPanorama.cpp). On TPU we express it as flattened gathers
(`jnp.take`) + fused lerps: the warp fields are smooth so XLA's gather is
bandwidth-bound and the arithmetic fuses into it.

Conventions (matching OpenCV):
- images are channels-first ``(..., C, H, W)`` float32;
- ``coords`` is ``(..., 2, Ho, Wo)`` with coords[0] = x (column into W),
  coords[1] = y (row into H), in source pixel units where integer
  coordinate i samples pixel i exactly;
- bicubic uses the Catmull-Rom-family kernel with a = -0.75 (OpenCV's
  INTER_CUBIC), so outputs are comparable to the reference's renders;
- border modes: "constant" (out-of-range samples 0 — the reference relies
  on this to make unseen pixels transparent via (-1,-1) coords,
  ImageWarper.cpp:179-196) and "wrap" (periodic in x, clamped in y — used
  for equirect seam handling, BORDER_WRAP in ImageWarper.cpp:137).
"""

from __future__ import annotations

from .precision import F32_PRECISION as _F32_PRECISION

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "remap",
    "remap_bilinear",
    "remap_bicubic",
    "remap_static_banded",
    "remap_static_banded_multi",
]


def _gather2d(img, iy, ix, border):
    """img (C, H, W); iy/ix int32 (...,) -> (C, ...). Indices are folded
    into range per the border mode; 'constant' validity is handled by the
    caller through weights/masks."""
    C, H, W = img.shape
    if border == "wrap":
        ix = jnp.mod(ix, W)
        iy = jnp.clip(iy, 0, H - 1)
    else:
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
    flat = img.reshape(C, H * W)
    idx = (iy * W + ix).reshape(-1)
    out = jnp.take(flat, idx, axis=1)
    return out.reshape((C,) + iy.shape)


def _cubic_weights(t, a=-0.75):
    """The 4 interpolation weights for fractional offset t in [0,1), taps at
    offsets (-1, 0, 1, 2). Keys' cubic with free parameter a (OpenCV uses
    a = -0.75)."""
    # |s| in (0,1): (a+2)|s|^3 - (a+3)|s|^2 + 1 ; |s| in (1,2): a(|s|-1)(|s|-2)^2... use direct form
    def k01(s):  # 0 <= s <= 1
        return ((a + 2.0) * s - (a + 3.0)) * s * s + 1.0

    def k12(s):  # 1 <= s <= 2
        return ((a * s - 5.0 * a) * s + 8.0 * a) * s - 4.0 * a

    w0 = k12(t + 1.0)
    w1 = k01(t)
    w2 = k01(1.0 - t)
    w3 = k12(2.0 - t)
    return w0, w1, w2, w3


def _remap_single(img, coords, interpolation, border):
    C, H, W = img.shape
    x = coords[0]
    y = coords[1]

    if interpolation == "bilinear":
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        taps = [
            (iy0, ix0, (1 - tx) * (1 - ty)),
            (iy0, ix0 + 1, tx * (1 - ty)),
            (iy0 + 1, ix0, (1 - tx) * ty),
            (iy0 + 1, ix0 + 1, tx * ty),
        ]
    elif interpolation == "bicubic":
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        wx = _cubic_weights(tx)
        wy = _cubic_weights(ty)
        taps = [
            (iy0 + dy - 1, ix0 + dx - 1, wx[dx] * wy[dy])
            for dy in range(4)
            for dx in range(4)
        ]
    else:
        raise ValueError(f"unknown interpolation: {interpolation}")

    out = jnp.zeros((C,) + x.shape, dtype=img.dtype)
    if border == "constant":
        # a tap contributes only if it lands inside the image
        for iy, ix, w in taps:
            valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
            out = out + jnp.where(valid, w, 0.0) * _gather2d(img, iy, ix, border)
    else:
        for iy, ix, w in taps:
            out = out + w * _gather2d(img, iy, ix, border)
    return out


# Peak f32 elements allowed for one matmul-remap chunk's (C, Pc, H)
# intermediate (per batch element handled by vmap on top).
_REMAP_MATMUL_CHUNK_ELEMS = 48 * 1024 * 1024


def _onehot_weights_1d(taps_weights, n, mode):
    """Interpolation matrix (..., P, n): sum over taps of (grid == idx) * w,
    for idx/w of any leading shape (..., P). mode: "constant" (out-of-range
    taps get zero weight), "wrap", or "clamp" (edge replication)."""
    grid = jnp.arange(n, dtype=jnp.int32)
    out = None
    for idx, w in taps_weights:
        if mode == "wrap":
            idx = jnp.mod(idx, n)
        elif mode == "clamp":
            idx = jnp.clip(idx, 0, n - 1)
        hit = (grid == idx[..., None]).astype(jnp.float32) * w[..., None]
        out = hit if out is None else out + hit
    return out


def _remap_matmul_single(img, coords, interpolation, border):
    """Remap as two one-hot interpolation matmuls (MXU) instead of gathers
    (XLA:TPU gathers lower to a slow scalar loop). Chunked over output rows
    to bound the (C, Pc, Hsrc) intermediate."""
    C, H, W = img.shape
    _, Ho, Wo = coords.shape

    rows_per_chunk = max(1, _REMAP_MATMUL_CHUNK_ELEMS // max(C * Wo * H, 1))
    rows_per_chunk = min(rows_per_chunk, Ho)
    n_chunks = -(-Ho // rows_per_chunk)
    pad_rows = n_chunks * rows_per_chunk - Ho
    coords_p = jnp.pad(coords, [(0, 0), (0, pad_rows), (0, 0)])
    chunks = coords_p.reshape(2, n_chunks, rows_per_chunk, Wo).transpose(
        1, 0, 2, 3
    )

    def taps_1d(t, i0):
        if interpolation == "bilinear":
            return [(i0, 1.0 - t), (i0 + 1, t)]
        w0, w1, w2, w3 = _cubic_weights(t)
        return [(i0 - 1, w0), (i0, w1), (i0 + 1, w2), (i0 + 2, w3)]

    def chunk_fn(co):
        x = co[0].reshape(-1)
        y = co[1].reshape(-1)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        # gather-path parity: "wrap" wraps x but clamps y (_gather2d)
        x_mode = "wrap" if border == "wrap" else "constant"
        y_mode = "clamp" if border == "wrap" else "constant"
        ohx = _onehot_weights_1d(_pairs(taps_1d(x - x0, ix0)), W, x_mode)
        ohy = _onehot_weights_1d(_pairs(taps_1d(y - y0, iy0)), H, y_mode)
        tmp = jnp.einsum("pw,chw->cph", ohx, img, precision=_F32_PRECISION)
        out = jnp.einsum("ph,cph->cp", ohy, tmp, precision=_F32_PRECISION)
        return out.reshape(C, rows_per_chunk, Wo)

    out = jax.lax.map(chunk_fn, chunks)  # (n_chunks, C, rc, Wo)
    out = out.transpose(1, 0, 2, 3).reshape(C, n_chunks * rows_per_chunk, Wo)
    return out[:, :Ho]


def _pairs(taps):
    return [(idx, jnp.broadcast_to(w, idx.shape)) for idx, w in taps]


def _static_axis_bounds(vals, n, pad_taps):
    """Host: (lo, hi) source bounds actually sampled by ``vals`` —
    coords far outside the frame can't contribute taps (constant border
    zeroes them), so they are excluded."""
    valid = (
        np.isfinite(vals) & (vals > -(pad_taps + 1)) & (vals < n + pad_taps + 1)
    )
    vmin = float(vals[valid].min()) if valid.any() else 0.0
    vmax = float(vals[valid].max()) if valid.any() else 0.0
    lo = int(np.clip(np.floor(vmin) - pad_taps, 0, max(n - 1, 0)))
    hi = int(np.clip(np.ceil(vmax) + pad_taps + 1, 1, n))
    return lo, hi


def _plan_static_tiles(coords_np, H, W, tr, tc, pad_taps):
    """Host: per-(tile, warp) aligned window origins + uniform window
    sizes for the fused Pallas sampler. coords_np (N, 2, Ho, Wo).
    Returns (sy (T, N), sx (T, N), bh, bw, nty, ntx) with origins on the
    (8, 128) memref tiling and bh/bw covering every tile's span."""
    N, _, Ho, Wo = coords_np.shape
    nty, ntx = -(-Ho // tr), -(-Wo // tc)
    pr, pc = nty * tr - Ho, ntx * tc - Wo
    v = np.pad(coords_np, [(0, 0), (0, 0), (0, pr), (0, pc)], mode="edge")
    v = v.reshape(N, 2, nty, tr, ntx, tc)

    def axis(vals, n, align):
        valid = (
            np.isfinite(vals)
            & (vals > -(pad_taps + 1))
            & (vals < n + pad_taps + 1)
        )
        vmin = np.where(valid, vals, np.inf).min(axis=(2, 4))
        vmax = np.where(valid, vals, -np.inf).max(axis=(2, 4))
        none = ~valid.any(axis=(2, 4))
        vmin = np.where(none, 0.0, vmin)
        vmax = np.where(none, 0.0, vmax)
        lo = np.clip(np.floor(vmin) - pad_taps, 0, max(n - 1, 0))
        hi = np.clip(np.ceil(vmax) + pad_taps + 1, 1, n)
        lo_a = (lo.astype(np.int64) // align) * align
        b = int(np.max(hi - lo_a))
        b = -(-b // align) * align
        return lo_a.astype(np.int32), b

    def axis_pertile(vals, n, align):
        valid = (
            np.isfinite(vals)
            & (vals > -(pad_taps + 1))
            & (vals < n + pad_taps + 1)
        )
        vmin = np.where(valid, vals, np.inf).min(axis=(2, 4))
        vmax = np.where(valid, vals, -np.inf).max(axis=(2, 4))
        none = ~valid.any(axis=(2, 4))
        vmin = np.where(none, 0.0, vmin)
        vmax = np.where(none, 0.0, vmax)
        lo = np.clip(np.floor(vmin) - pad_taps, 0, max(n - 1, 0))
        hi = np.clip(np.ceil(vmax) + pad_taps + 1, 1, n)
        lo_a = (lo.astype(np.int64) // align) * align
        b = hi - lo_a  # (N, nty, ntx) per-(warp, tile) required extent
        b = (-(-b.astype(np.int64) // align)) * align
        return b.max(axis=0).reshape(-1)  # (T,) max over warps

    sy, bh = axis(v[:, 1], H, 8)  # (N, nty, ntx)
    # x-axis: UNALIGNED origins + the exact max span (tight-x mode — the
    # kernel quantizes for the DMA and residual-rolls the window, so the
    # per-step interpolation-matrix build pays bw_t lanes, not the
    # up-to-127-lane alignment slack the old aligned plan folded into bw)
    sx, bw_t = axis(v[:, 0], W, 1)
    bw = -(-(bw_t + 127) // 128) * 128  # fetch extent covering the roll
    bh_t = axis_pertile(v[:, 1], H, 8)  # (T,) per-tile row extent
    sy = sy.reshape(N, -1).T.copy()  # (T, N)
    sx = sx.reshape(N, -1).T.copy()
    return sy, sx, bh, bw, bw_t, nty, ntx, bh_t


def _remap_static_pallas(
    imgs, coords_np, interpolation, border, tr, tc, coords_dev
):
    """Fused-kernel path for static multi-warp remaps: per-(tile, warp)
    windows DMA'd straight to VMEM with host-planned aligned origins — no
    HBM stage temps (the XLA banded path moved 593 GiB for the 6k
    projection). imgs (N, C, H, W). Returns (N, C, Ho, Wo) or None when
    the planned windows exceed the kernel's VMEM budget."""
    from .pallas_remap import fused_window_sample, pallas_window_supported

    N, C, H, W = imgs.shape
    _, _, Ho, Wo = coords_np.shape
    pad_taps = 3 if interpolation == "bicubic" else 1
    sy, sx, bh, bw, bw_t, nty, ntx, bh_t = _plan_static_tiles(
        coords_np, H, W, tr, tc, pad_taps
    )
    P = tr * tc
    if not pallas_window_supported(C, P, bh, bw, N, tight_x=True):
        return None
    # pad so every aligned origin's window is in bounds (x origins are
    # unaligned; the kernel DMAs from their 128-quantized floor)
    pad_y = max(0, int(sy.max()) + bh - H)
    pad_x = max(0, int((sx // 128 * 128).max()) + bw - W)
    padded = jnp.pad(imgs, [(0, 0), (0, 0), (0, pad_y), (0, pad_x)])

    co = coords_dev if coords_dev is not None else jnp.asarray(
        coords_np, jnp.float32
    )
    pr, pc = nty * tr - Ho, ntx * tc - Wo
    co = jnp.pad(co, [(0, 0), (0, 0), (0, pr), (0, pc)], mode="edge")
    co = co.reshape(N, 2, nty, tr, ntx, tc)
    co = co.transpose(2, 4, 0, 1, 3, 5).reshape(nty * ntx, N, 2, P)

    # Bucket tiles by their required ROW extent (x-extents are uniform —
    # lens warps span similar columns everywhere, and lane alignment puts
    # a 128 floor on bw anyway, but row spans vary 4x across the fisheye:
    # 6k projection measured median 45 / max 124 rows, so one uniform
    # bh = max wastes ~2.3x MXU+DMA on most tiles). 3 buckets keep the
    # Mosaic instance count (compile time) bounded; each bucket runs one
    # fused kernel over its own tile subset and the outputs reassemble by
    # the inverse permutation.
    T = nty * ntx
    uniq = np.unique(bh_t)
    outs = []
    order = []
    if T >= 64 and len(uniq) > 3:
        qs = [np.quantile(bh_t, 0.5), np.quantile(bh_t, 0.85), bh_t.max()]
        levels = sorted({int(-(-q // 8) * 8) for q in qs})
    else:
        levels = [int(bh_t.max())]
    # Bucket selection must NOT gather the traced coord array: an XLA
    # gather feeding a pallas_call operand inside a larger program
    # kernel-faults the TPU worker (measured 2026-08-19 at the 6k fisheye
    # geometry; eager/static-slice/elementwise producers are fine). Each
    # bucket instead passes its tile indices as the kernel's STATIC
    # tile_map — the selection rides the scalar-prefetch channel into the
    # BlockSpec index maps and the full coord array is consumed directly.
    xt_full = co[:, :, 0]
    yt_full = co[:, :, 1]
    prev = -1
    for lv in levels:
        m = (bh_t > prev) & (bh_t <= lv)
        prev = lv
        idx = np.nonzero(m)[0]
        if idx.size == 0:
            continue
        order.append(idx)
        outs.append(
            fused_window_sample(
                padded,
                jnp.asarray(sy[idx]),
                jnp.asarray(sx[idx]),
                xt_full,
                yt_full,
                bh=int(lv),
                bw=bw,
                pad_y=0,
                pad_x=0,
                n_y=H,
                n_x=W,
                interpolation=interpolation,
                border=border,
                base_bw=bw_t,
                tile_map=None
                if idx.size == T
                else tuple(int(i) for i in idx),
            )
        )  # (Tb, N, C, P)
    inv = np.empty(T, np.int64)
    inv[np.concatenate(order)] = np.arange(T)
    out = jnp.concatenate(outs, axis=0)[inv]
    out = out.reshape(nty, ntx, N, C, tr, tc)
    out = out.transpose(2, 3, 0, 4, 1, 5).reshape(
        N, C, nty * tr, ntx * tc
    )
    return out[..., :Ho, :Wo]


def remap_static_banded_multi(
    imgs,
    coords_np: "np.ndarray",
    interpolation: str = "bicubic",
    border: str = "constant",
    chunk_rows: int = 16,
    tile_cols: int = 64,
    coords_dev=None,
):
    """Matmul remap of N images through N STATIC warps, banded in BOTH
    axes: the warps are known on host, so each chunk of output rows only
    needs the band of source rows it actually samples, and within a chunk
    each tile of output columns only needs its band of source columns.
    Stage A shrinks from (Pc x Hsrc x Wsrc) contractions to
    (Pt x Hband x Wband) — exact per-tile extents, no halo guessing. Lens
    warps are smooth, so this typically cuts the dense one-hot matmul work
    10-40x.

    Bands/windows are UNIONED across the N warps so all N remaps ride one
    einsum pair per row-chunk and the one-hot construction is batched
    rather than unrolled per tile — a rig's side cameras share geometry up
    to calibration deltas, so the union costs a few pixels of band width
    while cutting the emitted HLO ~an order of magnitude (whole-frame
    programs at 3k+ presets otherwise OOM the XLA compiler).

    imgs: (N, ..., C, H, W) — extra dims between N and C are batch dims
    sharing warp N; coords_np: host numpy (N, 2, Ho, Wo).
    Returns (N, ..., C, Ho, Wo).

    coords_dev, when given, is a traced/device array with the SAME values
    as coords_np: the host copy drives band planning while the device copy
    feeds the one-hot weights, so the warp table rides the jit boundary as
    an argument instead of hundreds of MB of HLO constant literals at
    preset scale (the compile tunnel rejects >~250 MB programs)."""
    coords_np = np.asarray(coords_np)
    N, _, Ho, Wo = coords_np.shape
    H, W = imgs.shape[-2:]
    assert imgs.shape[0] == N, (imgs.shape, coords_np.shape)
    if (
        jax.default_backend() == "tpu"
        and border == "constant"
        and imgs.ndim == 4
    ):
        out = _remap_static_pallas(
            imgs, coords_np, interpolation, border, 16, 128, coords_dev
        )
        if out is not None:
            return out
    return _remap_static_banded_bucketed(
        imgs,
        coords_np,
        interpolation,
        border,
        chunk_rows,
        tile_cols,
        coords_dev,
    )


def _quantize_band(b: int, n: int) -> int:
    """Round band size b up to 3 mantissa bits (next multiple of
    2^(bitlength-3)), capped at n: chunks fall into a bounded ladder of
    size classes (<=12.5% band inflation) so each class shares ONE traced
    lax.map body instead of one HLO block per chunk."""
    if b >= n:
        return n
    step = 1 << max(3, (b - 1).bit_length() - 3)
    return min(n, -(-b // step) * step)


def _remap_static_banded_bucketed(
    imgs, coords_np, interpolation, border, chunk_rows, tile_cols, coords_dev
):
    """Size-bucketed implementation of the banded static remap.

    The original emitted one HLO block PER row-chunk (bands differ in
    size, so nothing could share a trace): ~200 unrolled einsum pairs at
    6k, whose XLA compile dominates video-pipeline startup on this
    platform (no persistent compile cache, 1-core host). Here per-chunk
    band sizes are quantized to a few size classes; every chunk in a
    class runs through one lax.map body with TRACED band origins
    (dynamic_slice), so the program holds one body per class instead of
    one per chunk. Quantized bands are supersets of the exact ones with
    origins clamped into the source, so constant-border tap validity and
    clamp folding are unchanged (out-of-band taps still miss / fold to
    the true edge)."""
    coords_np = np.asarray(coords_np)
    N, _, Ho, Wo = coords_np.shape
    H, W = imgs.shape[-2:]
    pad_taps = 3 if interpolation == "bicubic" else 1
    # "wrap" x coords can sample across the seam; banding x would need
    # modular windows — keep wrap remaps x-unbanded (y banding still wins)
    band_x = border != "wrap" and Wo > tile_cols
    ntx = -(-Wo // tile_cols) if band_x else 1
    n_chunks = -(-Ho // chunk_rows)

    # uniform chunk geometry: pad output rows (and tile cols) on host,
    # trim at the end
    pad_r = n_chunks * chunk_rows - Ho
    pad_c = ntx * tile_cols - Wo if band_x else 0
    co_np = np.pad(
        coords_np, [(0, 0), (0, 0), (0, pad_r), (0, pad_c)], mode="edge"
    )
    if coords_dev is not None:
        cd = jnp.pad(
            coords_dev, [(0, 0), (0, 0), (0, pad_r), (0, pad_c)], mode="edge"
        )
    else:
        cd = jnp.asarray(co_np, jnp.float32)

    def taps_1d(t, i0):
        if interpolation == "bilinear":
            return [(i0, 1.0 - t), (i0 + 1, t)]
        w0, w1, w2, w3 = _cubic_weights(t)
        return [(i0 - 1, w0), (i0, w1), (i0 + 1, w2), (i0 + 2, w3)]

    def onehot(vals, n, mode):
        v0 = jnp.floor(vals)
        return _onehot_weights_1d(
            _pairs(taps_1d(vals - v0, v0.astype(jnp.int32))), n, mode
        )

    x_mode = "wrap" if border == "wrap" else "constant"
    y_mode = "clamp" if border == "wrap" else "constant"
    lead_elems = int(np.prod(imgs.shape[:-2], dtype=np.int64))
    P = chunk_rows * (tile_cols if band_x else Wo)

    # host planning: per-chunk y band + (band_x) per-(chunk, tile) x bands
    y_np = co_np[:, 1].reshape(N, n_chunks, chunk_rows, ntx, tile_cols if band_x else Wo)
    x_np = co_np[:, 0].reshape(N, n_chunks, chunk_rows, ntx, tile_cols if band_x else Wo)
    plans = []  # (hb_q, wb_q) -> list of (chunk, y_lo, x_los)
    buckets: dict = {}
    for c in range(n_chunks):
        y_lo, y_hi = _static_axis_bounds(y_np[:, c], H, pad_taps)
        hb = _quantize_band(y_hi - y_lo, H)
        y_lo = min(y_lo, H - hb)
        if band_x:
            x_los, wb = [], 1
            for t in range(ntx):
                lo, hi = _static_axis_bounds(x_np[:, c, :, t], W, pad_taps)
                x_los.append(lo)
                wb = max(wb, hi - lo)
            wb = _quantize_band(wb, W)
            x_los = [min(lo, W - wb) for lo in x_los]
        else:
            x_los, wb = [0], W
        buckets.setdefault((hb, wb), []).append((c, y_lo, x_los))

    cd_t = cd.reshape(
        (N, 2, n_chunks, chunk_rows, ntx, tile_cols if band_x else Wo)
    )
    cd_t = cd_t.transpose(2, 4, 0, 1, 3, 5)  # (n_chunks, ntx, N, 2, r, tc)
    cd_t = cd_t.reshape(n_chunks, ntx, N, 2, P)

    out_chunks = [None] * n_chunks
    for (hb, wb), entries in sorted(buckets.items()):
        k = len(entries)
        idxs = np.asarray([e[0] for e in entries], np.int32)
        y_los = jnp.asarray([e[1] for e in entries], jnp.int32)  # (k,)
        x_los = jnp.asarray(
            np.asarray([e[2] for e in entries], np.int32)
        )  # (k, ntx)
        xs_k = cd_t[idxs, :, :, 0]  # (k, ntx, N, P)
        ys_k = cd_t[idxs, :, :, 1]

        # per-map-step stage temp: sub-group tiles when it exceeds budget
        tmp_elems = ntx * lead_elems * P * min(hb, wb)
        g = ntx
        if tmp_elems > _REMAP_MATMUL_CHUNK_ELEMS:
            per_tile = max(1, tmp_elems // ntx)
            g = max(1, int(_REMAP_MATMUL_CHUNK_ELEMS // per_tile))
            g = max(d for d in range(1, g + 1) if ntx % d == 0)

        def contract(xs_, ys_, win_):
            # (..., N, P, wb/hb) one-hots against (..., N, lead, C, hb, wb)
            ohx = onehot(xs_, wb, "constant" if band_x else x_mode)
            ohy = onehot(ys_, hb, y_mode if y_mode == "clamp" else "constant")
            if hb > wb and hb >= 512:
                tmp = jnp.einsum(
                    "xnph,xn...chw->xn...cpw", ohy, win_, precision=_F32_PRECISION
                )
                return jnp.einsum(
                    "xnpw,xn...cpw->xn...cp", ohx, tmp, precision=_F32_PRECISION
                )
            tmp = jnp.einsum(
                "xnpw,xn...chw->xn...cph", ohx, win_, precision=_F32_PRECISION
            )
            return jnp.einsum(
                "xnph,xn...cph->xn...cp", ohy, tmp, precision=_F32_PRECISION
            )

        def body(args):
            xs_c, ys_c, y_lo, x_lo = args  # (ntx, N, P), scalar, (ntx,)
            band = jax.lax.dynamic_slice_in_dim(imgs, y_lo, hb, axis=-2)
            wins = jnp.stack(
                [
                    jax.lax.dynamic_slice_in_dim(band, x_lo[t], wb, axis=-1)
                    for t in range(ntx)
                ]
            )  # (ntx, N, ..., C, hb, wb)
            xs_l = xs_c - x_lo[:, None, None].astype(jnp.float32)
            ys_l = ys_c - y_lo.astype(jnp.float32)
            if g == ntx:
                return contract(xs_l, ys_l, wins)
            grp = lambda a: a.reshape((ntx // g, g) + a.shape[1:])
            out = jax.lax.map(
                lambda a: contract(*a), (grp(xs_l), grp(ys_l), grp(wins))
            )
            return out.reshape((ntx,) + out.shape[2:])

        if k == 1:
            outs = body((xs_k[0], ys_k[0], y_los[0], x_los[0]))[None]
        else:
            outs = jax.lax.map(body, (xs_k, ys_k, y_los, x_los))
        # (k, ntx, N, ..., C, P) -> per chunk (N, ..., C, rows, cols)
        outs = outs.reshape(
            (k, ntx) + imgs.shape[:-2] + (chunk_rows, tile_cols if band_x else Wo)
        )
        outs = jnp.moveaxis(outs, 1, -2)
        outs = outs.reshape(
            (k,)
            + imgs.shape[:-2]
            + (chunk_rows, ntx * (tile_cols if band_x else Wo))
        )
        for j, (c, _, _) in enumerate(entries):
            out_chunks[c] = outs[j][..., :Wo]
    out = jnp.concatenate(out_chunks, axis=-2)
    return out[..., :Ho, :]


def remap_static_banded(
    img,
    coords_np: "np.ndarray",
    interpolation: str = "bicubic",
    border: str = "constant",
    chunk_rows: int = 16,
    tile_cols: int = 64,
    coords_dev=None,
):
    """Single-warp convenience over remap_static_banded_multi.

    img: (C, H, W) or (B, C, H, W) sharing ONE warp; coords_np: host numpy
    (2, Ho, Wo). Returns (..., C, Ho, Wo)."""
    out = remap_static_banded_multi(
        img[None],
        np.asarray(coords_np)[None],
        interpolation,
        border,
        chunk_rows,
        tile_cols,
        coords_dev=None if coords_dev is None else coords_dev[None],
    )
    return out[0]


@partial(jax.jit, static_argnames=("interpolation", "border", "method"))
def remap(
    img,
    coords,
    interpolation: str = "bicubic",
    border: str = "constant",
    method: str = "auto",
):
    """Resample ``img`` at ``coords``.

    img: (..., C, H, W); coords: (..., 2, Ho, Wo) in (x, y) source pixels.
    Leading batch dims of img and coords broadcast against each other
    (vmapped). Returns (..., C, Ho, Wo).

    method: "gather" | "matmul" | "auto". On TPU the matmul path (one-hot
    interpolation matrices on the MXU) is ~an order of magnitude faster
    than XLA's scalar-loop gathers; "auto" uses it except on CPU where
    native gathers win.
    """
    img = jnp.asarray(img)
    coords = jnp.asarray(coords)
    ibatch = img.shape[:-3]
    cbatch = coords.shape[:-3]
    batch = jnp.broadcast_shapes(ibatch, cbatch)
    img_b = jnp.broadcast_to(img, batch + img.shape[-3:])
    coords_b = jnp.broadcast_to(coords, batch + coords.shape[-3:])
    if method == "auto":
        method = (
            "matmul" if jax.default_backend() not in ("cpu",) else "gather"
        )
    if method == "matmul":
        fn = lambda im, co: _remap_matmul_single(im, co, interpolation, border)
    else:
        fn = lambda im, co: _remap_single(im, co, interpolation, border)
    for _ in batch:
        fn = jax.vmap(fn)
    return fn(img_b, coords_b)


def remap_bilinear(img, coords, border: str = "constant"):
    return remap(img, coords, interpolation="bilinear", border=border)


def remap_bicubic(img, coords, border: str = "constant"):
    return remap(img, coords, interpolation="bicubic", border=border)
