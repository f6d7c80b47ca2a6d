"""Fused Pallas TPU kernels for the per-level frontend hot loop (E1).

The jnp composition in ops/fast.py materializes the 16 ring-shifted images
and re-reads a 24-slab stack per sliding window — ~2 GB of HBM traffic per
frame (measured via XLA cost analysis). These kernels tile each pyramid
level over row bands, DMA one halo'd band into VMEM, and produce the whole
FAST-9 segment-test score + 3×3 NMS (and separately the 7×7 Gaussian blur)
in a single pass: HBM traffic drops to one image read + one output write.

Reference behavior being reproduced: `ORBextractor`'s per-level FAST with
dual thresholds and NMS plus the pre-BRIEF Gaussian blur (settings keys in
every YAML, `/root/reference/config/Monocular-Inertial/EuRoC.yaml:56-69`)
[upstream pipeline; see ops/fast.py and ops/pyramid.py for the semantics
oracle-tested against OpenCV].

Numerical contract: identical to `fast.fast_score` / `fast.nms3x3` on the
interior; the ≤3-px border differs (zero- vs wrap-padding) and is masked by
the extractor's EDGE margin anyway. The blur matches `pyramid.gaussian_blur`
away from a 3-px margin (zero- vs reflect-padding), also inside the mask.

Dispatch: `fast_nms(img)` / `blur7(img)` run the Pallas kernel on TPU and
fall back to the reference jnp composition elsewhere (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orb_slam3_ros2_tpu.ops import fast as fast_ops
from orb_slam3_ros2_tpu.ops import pyramid as pyr_ops

ARC = fast_ops.ARC_LEN
OFFSETS = fast_ops.CIRCLE_OFFSETS
BORDER = fast_ops.BORDER
HALO = 4  # 3 px FAST ring + 1 px NMS neighborhood
TILE = 32  # row band per grid step; keeps Mosaic's scoped VMEM well under 16M


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _make_fast_nms_kernel(H: int, W: int):
    """Kernel over a zero-padded (Hp+2*HALO, W+2*HALO) image in HBM.

    Grid step i computes score+keep for global rows [i*TILE, (i+1)*TILE).
    Scores are evaluated on a 1-px-wider apron so the NMS sees its true
    neighbors across band boundaries.
    """

    def kernel(img_hbm, score_ref, keep_ref):
        i = pl.program_id(0)

        def body(slab, sem):
            cp = pltpu.make_async_copy(
                img_hbm.at[pl.ds(i * TILE, TILE + 2 * HALO), :], slab, sem
            )
            cp.start()
            cp.wait()
            a = slab[:]  # rows ↔ global [i*TILE-HALO, i*TILE+TILE+HALO)
            th, tw = TILE + 2, W + 2  # score apron: global rows/cols -1..+1
            center = a[3:3 + th, 3:3 + tw]

            best = jnp.zeros((th, tw), jnp.float32)
            for k in range(16):
                dy, dx = OFFSETS[k]
                d = a[3 + dy:3 + dy + th, 3 + dx:3 + dx + tw] - center
                wmin = d
                wmax = d
                for j in range(k + 1, k + ARC):
                    dy, dx = OFFSETS[j % 16]
                    d = a[3 + dy:3 + dy + th, 3 + dx:3 + dx + tw] - center
                    wmin = jnp.minimum(wmin, d)
                    wmax = jnp.maximum(wmax, d)
                # bright: all 9 ring px > center+t ⇒ min d; dark: −max d
                best = jnp.maximum(best, jnp.maximum(wmin, -wmax))

            gy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) \
                + i * TILE - 1
            gx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) - 1
            interior = (
                (gy >= BORDER) & (gy < H - BORDER)
                & (gx >= BORDER) & (gx < W - BORDER)
            )
            sc = jnp.where(interior, jnp.maximum(best, 0.0), 0.0)

            score_ref[:] = sc[1:1 + TILE, 1:1 + W]
            # 3×3 NMS, raster-order tie-break (same rule as fast.nms3x3)
            keep = jnp.ones((TILE, W), jnp.float32)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    neigh = sc[1 + dy:1 + dy + TILE, 1 + dx:1 + dx + W]
                    if (dy, dx) < (0, 0) or ((dy, dx) == (0, -1)):
                        ok = sc[1:1 + TILE, 1:1 + W] > neigh
                    else:
                        ok = sc[1:1 + TILE, 1:1 + W] >= neigh
                    keep = keep * ok.astype(jnp.float32)
            keep_ref[:] = keep

        pl.run_scoped(
            body,
            slab=pltpu.VMEM((TILE + 2 * HALO, _wpad(W)), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return kernel


def _make_blur_kernel(W: int):
    taps = [float(v) for v in pyr_ops._gauss_kernel1d(7, 2.0)]

    def kernel(img_hbm, out_ref):
        i = pl.program_id(0)

        def body(slab, sem):
            cp = pltpu.make_async_copy(
                img_hbm.at[pl.ds(i * TILE, TILE + 2 * HALO), :], slab, sem
            )
            cp.start()
            cp.wait()
            a = slab[:]
            # vertical taps over rows (global row r uses r−3..r+3; slab row
            # offset of global i*TILE is HALO=4, kernel starts at −3 ⇒ 1)
            v = jnp.zeros((TILE, W + 8), jnp.float32)
            for t in range(7):
                v = v + taps[t] * a[1 + t:1 + t + TILE, 0:W + 8]
            out = jnp.zeros((TILE, W), jnp.float32)
            for t in range(7):
                out = out + taps[t] * v[:, 1 + t:1 + t + W]
            out_ref[:] = out

        pl.run_scoped(
            body,
            slab=pltpu.VMEM((TILE + 2 * HALO, _wpad(W)), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return kernel


def _wpad(W: int) -> int:
    """Padded width: W + 2*HALO rounded up to the 128-lane tile."""
    return _cdiv(W + 2 * HALO, 128) * 128


def _pad_for_tiles(img: jnp.ndarray, Hp: int):
    H, W = img.shape
    out = jnp.zeros((Hp + 2 * HALO, _wpad(W)), img.dtype)
    return jax.lax.dynamic_update_slice(out, img, (HALO, HALO))


@functools.lru_cache(maxsize=None)
def _fast_nms_call(H: int, W: int, interpret: bool):
    Hp = _cdiv(H, TILE) * TILE
    return pl.pallas_call(
        _make_fast_nms_kernel(H, W),
        grid=(Hp // TILE,),
        out_shape=(
            jax.ShapeDtypeStruct((Hp, W), jnp.float32),
            jax.ShapeDtypeStruct((Hp, W), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((TILE, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _blur_call(H: int, W: int, interpret: bool):
    Hp = _cdiv(H, TILE) * TILE
    return pl.pallas_call(
        _make_blur_kernel(W),
        grid=(Hp // TILE,),
        out_shape=jax.ShapeDtypeStruct((Hp, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


HALO_F = 16  # fused-pass halo: 15 px moment disc + 1 px NMS neighborhood


def _wpad_f(W: int) -> int:
    return _cdiv(W + 2 * HALO_F, 128) * 128


TILE_F = 32  # fused-pass band height (>= 2*HALO_F so prev/next supply
# halos; 64 blows the 16M scoped-VMEM limit via the sparse-table live set)


def _make_frontend_kernel(H: int, W: int, with_moments: bool = True):
    """Fused per-level frontend pass producing FAST score, 3×3-NMS keep
    mask, optionally IC moment maps (m01, m10 over the radius-15 disc, cf.
    orb_descriptor.moment_maps), and the 7×7 Gaussian blur — everything the
    extractor needs per level except the final per-keypoint lookups.

    `with_moments=False` drops the moment maps: the lane prefix sums plus
    31 shifted-difference rows are ~2/3 of the kernel's vector ops, and the
    extractor only ever reads the maps at ≤budget keypoints — it is much
    cheaper to gather raw patches at those keypoints and take exact disc
    moments there (orb_descriptor.orientations).

    The banded halo is assembled from three auto-pipelined block inputs
    (previous/current/next TILE_F-row bands) so Pallas prefetches the next
    band's HBM copies while the current band computes — no DMA stall,
    unlike a run_scoped manual copy."""
    taps = [float(v) for v in pyr_ops._gauss_kernel1d(7, 2.0)]
    R = 15  # moment disc radius
    HF = HALO_F
    TILE = TILE_F

    def kernel(prev_ref, cur_ref, next_ref, *out_refs):
        if with_moments:
            score_ref, keep_ref, m01_ref, m10_ref, blur_ref = out_refs
        else:
            score_ref, keep_ref, blur_ref = out_refs
        i = pl.program_id(0)

        if True:  # keep the original body indentation
            a = jnp.concatenate(
                [prev_ref[TILE - HF:], cur_ref[:], next_ref[:HF]], axis=0
            )  # rows ↔ global [i*TILE-HF, i*TILE+TILE+HF)
            th, tw = TILE + 2, W + 2  # score apron: global rows/cols -1..+1

            # ---- FAST-9 segment-test score on the apron ----
            # each ring diff computed once; circular window-9 min/max via a
            # doubling sparse table (log2(9) levels) instead of re-scanning
            # the 9-arc per start: 144 vs 272 vector ops per pixel
            center = a[HF - 1:HF - 1 + th, HF - 1:HF - 1 + tw]
            d = []
            for k in range(16):
                dy, dx = OFFSETS[k]
                d.append(a[HF - 1 + dy:HF - 1 + dy + th,
                           HF - 1 + dx:HF - 1 + dx + tw] - center)

            def win9(vals, op):
                m2 = [op(vals[k], vals[(k + 1) % 16]) for k in range(16)]
                m4 = [op(m2[k], m2[(k + 2) % 16]) for k in range(16)]
                m8 = [op(m4[k], m4[(k + 4) % 16]) for k in range(16)]
                return [op(m8[k], vals[(k + 8) % 16]) for k in range(16)]

            mins = win9(d, jnp.minimum)
            maxs = win9(d, jnp.maximum)
            best = jnp.maximum(mins[0], -maxs[0])
            for k in range(1, 16):
                best = jnp.maximum(best, jnp.maximum(mins[k], -maxs[k]))

            gy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) \
                + i * TILE - 1
            gx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) - 1
            interior = (
                (gy >= BORDER) & (gy < H - BORDER)
                & (gx >= BORDER) & (gx < W - BORDER)
            )
            sc = jnp.where(interior, jnp.maximum(best, 0.0), 0.0)
            score_ref[:] = sc[1:1 + TILE, 1:1 + W]

            # ---- 3×3 NMS, raster-order tie-break ----
            keep = jnp.ones((TILE, W), jnp.float32)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dy == 0 and dx == 0:
                        continue
                    neigh = sc[1 + dy:1 + dy + TILE, 1 + dx:1 + dx + W]
                    if (dy, dx) < (0, 0) or ((dy, dx) == (0, -1)):
                        ok = sc[1:1 + TILE, 1:1 + W] > neigh
                    else:
                        ok = sc[1:1 + TILE, 1:1 + W] >= neigh
                    keep = keep * ok.astype(jnp.float32)
            keep_ref[:] = keep

            # ---- IC moment maps over the radius-15 disc ----
            # inclusive row prefix sums via log-shift adds along lanes
            if with_moments:
                _emit_moments(a, m01_ref, m10_ref)

            # ---- 7×7 Gaussian blur ----
            v = jnp.zeros((TILE, W + 8), jnp.float32)
            for t in range(7):
                v = v + taps[t] * a[HF - 3 + t:HF - 3 + t + TILE,
                                    HF - 4:HF + 4 + W]
            out = jnp.zeros((TILE, W), jnp.float32)
            for t in range(7):
                out = out + taps[t] * v[:, 1 + t:1 + t + W]
            blur_ref[:] = out

    def _emit_moments(a, m01_ref, m10_ref):
        if True:  # keep original indentation below
            lanes = a.shape[1]
            wx = (jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
                  .astype(jnp.float32) - float(HF))
            S = a
            C = a * wx
            sh = 1
            while sh < lanes:
                zs = jnp.zeros((a.shape[0], sh), jnp.float32)
                S = S + jnp.concatenate([zs, S[:, :-sh]], axis=1)
                C = C + jnp.concatenate([zs, C[:, :-sh]], axis=1)
                sh *= 2
            m01 = jnp.zeros((TILE, W), jnp.float32)
            msum = jnp.zeros((TILE, W), jnp.float32)
            mxw = jnp.zeros((TILE, W), jnp.float32)
            for dy in range(-R, R + 1):
                u = int(np.floor(np.sqrt(R * R - dy * dy)))
                # out row r ↔ slab row HF+r; sum over cols [x-u, x+u] =
                # S[HF+x+u] − S[HF+x−u−1]
                hi = S[HF + dy:HF + dy + TILE, HF + u:HF + u + W]
                lo = S[HF + dy:HF + dy + TILE, HF - u - 1:HF - u - 1 + W]
                rs = hi - lo
                chi = C[HF + dy:HF + dy + TILE, HF + u:HF + u + W]
                clo = C[HF + dy:HF + dy + TILE, HF - u - 1:HF - u - 1 + W]
                m01 = m01 + float(dy) * rs
                msum = msum + rs
                mxw = mxw + (chi - clo)
            xout = jax.lax.broadcasted_iota(jnp.int32, (TILE, W), 1).astype(
                jnp.float32
            )
            m01_ref[:] = m01
            m10_ref[:] = mxw - msum * xout

    return kernel


@functools.lru_cache(maxsize=None)
def _frontend_call(H: int, W: int, interpret: bool,
                   with_moments: bool = True):
    Hp = _cdiv(H, TILE_F) * TILE_F
    wp = _wpad_f(W)
    n_out = 5 if with_moments else 3
    # the padded image has one extra TILE_F band at top and bottom; block
    # index i of the padded array ↔ image band i-1
    in_band = lambda off: pl.BlockSpec(
        (TILE_F, wp), lambda i, off=off: (i + off, 0),
        memory_space=pltpu.VMEM,
    )
    out_band = pl.BlockSpec((TILE_F, W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_frontend_kernel(H, W, with_moments),
        grid=(Hp // TILE_F,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((Hp, W), jnp.float32) for _ in range(n_out)
        ),
        in_specs=[in_band(0), in_band(1), in_band(2)],
        out_specs=(out_band,) * n_out,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # bands are independent —
            # lets megacore chips split the grid across TensorCores
        ),
    )


def _pad_for_tiles_f(img: jnp.ndarray, Hp: int):
    H, W = img.shape
    out = jnp.zeros((Hp + 2 * TILE_F, _wpad_f(W)), img.dtype)
    return jax.lax.dynamic_update_slice(out, img, (TILE_F, HALO_F))


def frontend_pass(img: jnp.ndarray, interpret: bool | None = None):
    """(H, W) image -> (score, keep, m01, m10, blurred): the whole
    per-level frontend in one fused band pass (single HBM image read).
    jnp composition fallback off-TPU; `interpret` forces the Pallas
    interpreter (CPU oracle tests)."""
    from orb_slam3_ros2_tpu.ops import orb_descriptor as desc_ops

    if interpret is None and not _on_tpu():
        score = fast_ops.fast_score(img)
        m01, m10 = desc_ops.moment_maps(img)
        return (score, fast_ops.nms3x3(score), m01, m10,
                pyr_ops.gaussian_blur(img))
    H, W = img.shape
    Hp = _cdiv(H, TILE_F) * TILE_F
    padded = _pad_for_tiles_f(img, Hp)
    call = _frontend_call(H, W, bool(interpret))
    score, keepf, m01, m10, blur = call(padded, padded, padded)
    return (score[:H], keepf[:H] > 0.5, m01[:H], m10[:H], blur[:H])


def frontend_pass_lite(img: jnp.ndarray, interpret: bool | None = None):
    """(H, W) image -> (score, keep, blurred): the fused band pass WITHOUT
    the full-image IC moment maps (the extractor computes orientation from
    gathered raw patches instead — see _make_frontend_kernel docstring).
    jnp composition fallback off-TPU; `interpret` forces the interpreter."""
    if interpret is None and not _on_tpu():
        score = fast_ops.fast_score(img)
        return score, fast_ops.nms3x3(score), pyr_ops.gaussian_blur(img)
    H, W = img.shape
    Hp = _cdiv(H, TILE_F) * TILE_F
    padded = _pad_for_tiles_f(img, Hp)
    call = _frontend_call(H, W, bool(interpret), with_moments=False)
    score, keepf, blur = call(padded, padded, padded)
    return (score[:H], keepf[:H] > 0.5, blur[:H])


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# --------------------------------------------------------------------------
# packed-pyramid frontend: ALL levels in one canvas, ONE kernel launch
# --------------------------------------------------------------------------
#
# The per-level frontend_pass_lite costs ~8 small pallas launches per frame
# (~50 µs fixed cost each — half the extraction stage, r4 profiling). The
# packed variant stacks every pyramid level vertically in one
# (ΣH_l + gaps, W0) canvas (gap rows of zeros isolate the 4-px compute
# stencils) and runs ONE banded kernel over it; per-level interior masks
# are reconstructed in-kernel from the STATIC packing layout. A raw-canvas
# echo output keeps raw/blurred pixel coordinates identical so the
# downstream patch gather runs once over all levels too.

PACK_GAP = 8  # zero rows between packed levels (> max stencil reach 4)
PHALO = 8  # packed-kernel halo: 4-px stencil reach (FAST ring 3 + NMS 1),
# padded to 8 so slab slicing stays sublane-aligned
PTILE = 48  # packed-kernel band height (shallower live set than the
# moments kernel -> taller bands amortize per-band fixed cost)


def _wpad_p(W: int) -> int:
    return _cdiv(W + 2 * PHALO, 128) * 128


def pack_layout(shapes):
    """[(H_l, W_l)] -> (layout [(row0, H_l, W_l)], total_rows)."""
    layout = []
    off = 0
    for (h, w) in shapes:
        layout.append((off, h, w))
        off += h + PACK_GAP
    total = _cdiv(off - PACK_GAP, PTILE) * PTILE
    return tuple(layout), total


def _make_frontend_kernel_packed(layout, W0: int):
    """frontend_pass_lite semantics over a packed multi-level canvas.

    `layout` is static: per-level (row0, H_l, W_l) in canvas coordinates.
    Outputs: score, keep, blur, raw — all (Hp_total, W0), gap rows zero."""
    taps = [float(v) for v in pyr_ops._gauss_kernel1d(7, 2.0)]
    HF = PHALO
    TILE = PTILE

    def kernel(prev_ref, cur_ref, next_ref, score_ref, keep_ref, blur_ref,
               raw_ref):
        i = pl.program_id(0)
        a = jnp.concatenate(
            [prev_ref[TILE - HF:], cur_ref[:], next_ref[:HF]], axis=0
        )
        th, tw = TILE + 2, W0 + 2

        center = a[HF - 1:HF - 1 + th, HF - 1:HF - 1 + tw]
        d = []
        for k in range(16):
            dy, dx = OFFSETS[k]
            d.append(a[HF - 1 + dy:HF - 1 + dy + th,
                       HF - 1 + dx:HF - 1 + dx + tw] - center)

        def win9(vals, op):
            m2 = [op(vals[k], vals[(k + 1) % 16]) for k in range(16)]
            m4 = [op(m2[k], m2[(k + 2) % 16]) for k in range(16)]
            m8 = [op(m4[k], m4[(k + 4) % 16]) for k in range(16)]
            return [op(m8[k], vals[(k + 8) % 16]) for k in range(16)]

        mins = win9(d, jnp.minimum)
        maxs = win9(d, jnp.maximum)
        best = jnp.maximum(mins[0], -maxs[0])
        for k in range(1, 16):
            best = jnp.maximum(best, jnp.maximum(mins[k], -maxs[k]))

        # per-level interior mask from the STATIC layout: canvas row ->
        # (row-in-level, H_l, W_l); gap rows keep y_in = -1 -> masked
        gy = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + i * TILE - 1
        gx = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) - 1
        y_in = jnp.full((th, tw), -1, jnp.int32)
        hl = jnp.zeros((th, tw), jnp.int32)
        wl = jnp.zeros((th, tw), jnp.int32)
        for (r0, h, w) in layout:
            sel = (gy >= r0) & (gy < r0 + h)
            y_in = jnp.where(sel, gy - r0, y_in)
            hl = jnp.where(sel, h, hl)
            wl = jnp.where(sel, w, wl)
        interior = (
            (y_in >= BORDER) & (y_in < hl - BORDER)
            & (gx >= BORDER) & (gx < wl - BORDER)
        )
        sc = jnp.where(interior, jnp.maximum(best, 0.0), 0.0)
        score_ref[:] = sc[1:1 + TILE, 1:1 + W0]

        keep = jnp.ones((TILE, W0), jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                neigh = sc[1 + dy:1 + dy + TILE, 1 + dx:1 + dx + W0]
                if (dy, dx) < (0, 0) or ((dy, dx) == (0, -1)):
                    ok = sc[1:1 + TILE, 1:1 + W0] > neigh
                else:
                    ok = sc[1:1 + TILE, 1:1 + W0] >= neigh
                keep = keep * ok.astype(jnp.float32)
        keep_ref[:] = keep

        v = jnp.zeros((TILE, W0 + 8), jnp.float32)
        for t in range(7):
            v = v + taps[t] * a[HF - 3 + t:HF - 3 + t + TILE,
                                HF - 4:HF + 4 + W0]
        out = jnp.zeros((TILE, W0), jnp.float32)
        for t in range(7):
            out = out + taps[t] * v[:, 1 + t:1 + t + W0]
        blur_ref[:] = out
        # raw echo: aligns raw pixels with the blur canvas so ONE patch
        # gather serves both (orientation + BRIEF)
        raw_ref[:] = a[HF:HF + TILE, HF:HF + W0]

    return kernel


@functools.lru_cache(maxsize=None)
def _frontend_packed_call(layout, total_rows: int, W0: int,
                          interpret: bool):
    wp = _wpad_p(W0)
    in_band = lambda off: pl.BlockSpec(
        (PTILE, wp), lambda i, off=off: (i + off, 0),
        memory_space=pltpu.VMEM,
    )
    out_band = pl.BlockSpec((PTILE, W0), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_frontend_kernel_packed(layout, W0),
        grid=(total_rows // PTILE,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((total_rows, W0), jnp.float32)
            for _ in range(4)
        ),
        in_specs=[in_band(0), in_band(1), in_band(2)],
        out_specs=(out_band,) * 4,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )


def frontend_pass_packed(levels, interpret: bool | None = None):
    """All pyramid levels -> (score, keep, blur, raw) packed canvases +
    the static layout. ONE kernel launch for the whole frontend.

    Off-TPU (and not `interpret`): jnp fallback with identical packed
    output semantics, so CPU callers exercise the same canvas contract."""
    shapes = tuple((int(l.shape[0]), int(l.shape[1])) for l in levels)
    layout, total = pack_layout(shapes)
    W0 = shapes[0][1]

    if interpret is None and not _on_tpu():
        from orb_slam3_ros2_tpu.ops import orb_descriptor as desc_ops  # noqa

        score = jnp.zeros((total, W0), jnp.float32)
        keep = jnp.zeros((total, W0), bool)
        blur = jnp.zeros((total, W0), jnp.float32)
        raw = jnp.zeros((total, W0), jnp.float32)
        for (r0, h, w), im_l in zip(layout, levels):
            s_l = fast_ops.fast_score(im_l)
            k_l = fast_ops.nms3x3(s_l)
            b_l = pyr_ops.gaussian_blur(im_l)
            score = jax.lax.dynamic_update_slice(score, s_l, (r0, 0))
            keep = jax.lax.dynamic_update_slice(keep, k_l, (r0, 0))
            blur = jax.lax.dynamic_update_slice(blur, b_l, (r0, 0))
            raw = jax.lax.dynamic_update_slice(raw, im_l, (r0, 0))
        return score, keep, blur, raw, layout

    canvas = jnp.zeros((total + 2 * PTILE, _wpad_p(W0)), jnp.float32)
    for (r0, h, w), im_l in zip(layout, levels):
        canvas = jax.lax.dynamic_update_slice(
            canvas, im_l, (PTILE + r0, PHALO))
    call = _frontend_packed_call(layout, total, W0, bool(interpret))
    score, keepf, blur, raw = call(canvas, canvas, canvas)
    return score, keepf > 0.5, blur, raw, layout


def fast_nms(img: jnp.ndarray, interpret: bool | None = None):
    """(H, W) image -> (score, keep) like fast.fast_score + fast.nms3x3.

    Row-banded VMEM-resident fused pass on TPU; jnp fallback elsewhere.
    `interpret` forces the Pallas interpreter (CPU oracle tests).
    """
    if interpret is None and not _on_tpu():
        score = fast_ops.fast_score(img)
        return score, fast_ops.nms3x3(score)
    H, W = img.shape
    Hp = _cdiv(H, TILE) * TILE
    padded = _pad_for_tiles(img, Hp)
    score, keepf = _fast_nms_call(H, W, bool(interpret))(padded)
    return score[:H], keepf[:H] > 0.5


def blur7(img: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """7×7 σ=2 Gaussian like pyramid.gaussian_blur (zero-pad border)."""
    if interpret is None and not _on_tpu():
        return pyr_ops.gaussian_blur(img)
    H, W = img.shape
    Hp = _cdiv(H, TILE) * TILE
    padded = _pad_for_tiles(img, Hp)
    return _blur_call(H, W, bool(interpret))(padded)[:H]
