"""Pallas fused frontend kernels vs the jnp oracle (interpret mode on CPU).

The kernels must match ops/fast.py + ops/pyramid.py exactly on the interior
(the ≤3-px border is padding-dependent and masked by the extractor's EDGE
margin; see ops/pallas_kernels.py docstring).
"""

import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.ops import fast as fast_ops
from orb_slam3_ros2_tpu.ops import pallas_kernels as pk
from orb_slam3_ros2_tpu.ops import pyramid as pyr_ops


def _img(h=96, w=160, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    for _ in range(25):
        y, x = rng.integers(5, h - 15), rng.integers(5, w - 15)
        bh, bw = rng.integers(4, 12, size=2)
        img[y : y + bh, x : x + bw] = rng.uniform(30, 250)
    img += rng.normal(0, 1.5, size=img.shape)
    return np.clip(img, 0, 255).astype(np.float32)


def test_fast_nms_kernel_matches_jnp_oracle():
    img = jnp.asarray(_img())
    score_ref = np.asarray(fast_ops.fast_score(img))
    keep_ref = np.asarray(fast_ops.nms3x3(fast_ops.fast_score(img)))
    score, keep = pk.fast_nms(img, interpret=True)
    score, keep = np.asarray(score), np.asarray(keep)
    B = 4  # border slack: zero- vs wrap-padding differs only within 3 px
    np.testing.assert_allclose(
        score[B:-B, B:-B], score_ref[B:-B, B:-B], atol=1e-4
    )
    np.testing.assert_array_equal(keep[B:-B, B:-B], keep_ref[B:-B, B:-B])


def test_blur_kernel_matches_jnp_oracle_interior():
    img = jnp.asarray(_img(seed=1))
    ref = np.asarray(pyr_ops.gaussian_blur(img))
    out = np.asarray(pk.blur7(img, interpret=True))
    np.testing.assert_allclose(out[4:-4, 4:-4], ref[4:-4, 4:-4], rtol=1e-5,
                               atol=1e-3)


def test_binned_describe_close_to_exact():
    """TPU binned-matmul BRIEF must stay within a few bits of the exact
    per-keypoint steering (bounds the cross-platform descriptor drift)."""
    from orb_slam3_ros2_tpu.ops import orb_descriptor as desc_ops

    rng = np.random.default_rng(7)
    n = 128
    patches = jnp.asarray(
        rng.uniform(0, 255, (n, desc_ops.PATCH, desc_ops.PATCH))
        .astype(np.float32)
    )
    # smooth the patches like the real pipeline (blurred input)
    patches = jnp.asarray(
        np.stack([np.asarray(pyr_ops.gaussian_blur(p)) for p in patches])
    )
    angles = jnp.asarray(rng.uniform(-np.pi, np.pi, n).astype(np.float32))
    s_exact, b_exact = desc_ops.describe(patches, angles, binned=False)
    s_binned, b_binned = desc_ops.describe(patches, angles, binned=True)
    ham = 0.5 * (256.0 - np.einsum("nq,nq->n", np.asarray(s_exact),
                                   np.asarray(s_binned)))
    assert ham.mean() < 12.0, f"mean binned-vs-exact Hamming {ham.mean():.1f}"
    assert np.median(ham) < 12.0


def test_frontend_pass_kernel_matches_oracles_interior():
    """Fused pass (FAST + NMS + moment maps + blur) vs the individual jnp
    oracles on the interior (moment disc reaches 15 px, so compare >= 16 px
    from the border — the extractor's EDGE=19 margin guarantees more)."""
    from orb_slam3_ros2_tpu.ops import orb_descriptor as desc_ops

    img = jnp.asarray(_img(h=96, w=160, seed=3))
    score, keep, m01, m10, blur = (
        np.asarray(v) for v in pk.frontend_pass(img, interpret=True)
    )
    score_ref = np.asarray(fast_ops.fast_score(img))
    keep_ref = np.asarray(fast_ops.nms3x3(fast_ops.fast_score(img)))
    m01_ref, m10_ref = (np.asarray(v) for v in desc_ops.moment_maps(img))
    blur_ref = np.asarray(pyr_ops.gaussian_blur(img))

    B = 16
    sl = np.s_[B:-B, B:-B]
    np.testing.assert_allclose(score[sl], score_ref[sl], atol=1e-4)
    np.testing.assert_array_equal(keep[sl], keep_ref[sl])
    # moments agree to f32 prefix-sum rounding (values are O(1e4-1e5);
    # a few absolute units is ~1e-5 relative — invisible in arctan2)
    np.testing.assert_allclose(m01[sl], m01_ref[sl], rtol=2e-4, atol=2.0)
    np.testing.assert_allclose(m10[sl], m10_ref[sl], rtol=2e-4, atol=2.0)
    np.testing.assert_allclose(blur[sl], blur_ref[sl], rtol=1e-5, atol=1e-3)


def test_frontend_packed_matches_per_level_oracle():
    """The packed multi-level canvas kernel must reproduce the per-level
    frontend (score/NMS/blur/raw) inside each level's interior, with gap
    rows zeroed — one launch for the whole pyramid."""
    levels = [jnp.asarray(_img(96, 160, seed=2)),
              jnp.asarray(_img(80, 133, seed=3)),
              jnp.asarray(_img(64, 111, seed=4))]
    score_c, keep_c, blur_c, raw_c, layout = pk.frontend_pass_packed(
        levels, interpret=True)
    score_c = np.asarray(score_c)
    keep_c = np.asarray(keep_c)
    blur_c = np.asarray(blur_c)
    raw_c = np.asarray(raw_c)
    B = 4
    for (r0, h, w), im_l in zip(layout, levels):
        s_ref = np.asarray(fast_ops.fast_score(im_l))
        k_ref = np.asarray(fast_ops.nms3x3(fast_ops.fast_score(im_l)))
        b_ref = np.asarray(pyr_ops.gaussian_blur(im_l))
        np.testing.assert_allclose(
            score_c[r0 + B:r0 + h - B, B:w - B],
            s_ref[B:-B, B:-B], atol=1e-4)
        np.testing.assert_array_equal(
            keep_c[r0 + B:r0 + h - B, B:w - B], k_ref[B:-B, B:-B])
        np.testing.assert_allclose(
            blur_c[r0 + B:r0 + h - B, B:w - B],
            b_ref[B:-B, B:-B], rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(
            raw_c[r0:r0 + h, :w], np.asarray(im_l), atol=1e-6)
    # gap rows between levels carry zero score (no cross-level leakage)
    for (r0, h, w) in layout[:-1]:
        gap = score_c[r0 + h:r0 + h + pk.PACK_GAP - 1]
        assert np.all(gap == 0.0)


def test_extractor_packed_equals_unpacked_features():
    """End-to-end: the packed-canvas extractor path (TPU layout, forced via
    interpret) must produce the same keypoints/descriptors as the CPU
    per-level fallback on the same image."""
    from orb_slam3_ros2_tpu.frontend import extractor as ex
    from orb_slam3_ros2_tpu.ops import orb_descriptor as desc_ops
    import jax

    cfg = ex.ExtractorConfig(n_features=200, n_levels=3, height=96,
                             width=160)
    img = jnp.asarray(_img(96, 160, seed=5))

    # CPU fallback path (per-level oracle)
    extract = ex.make_extractor(cfg)
    f_cpu = extract(img)

    # packed path via interpret-mode pallas on the same host
    levels = pyr_ops.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
    score_c, keep_c, blur_c, raw_c, layout = pk.frontend_pass_packed(
        levels, interpret=True)
    budgets = pyr_ops.features_per_level(cfg.n_features, cfg.n_levels,
                                         cfg.scale_factor)
    n0 = budgets[0]
    (r0, h, w) = layout[0]
    score = jax.lax.slice(score_c, (r0, 0), (r0 + h, w))
    keep = jax.lax.slice(keep_c, (r0, 0), (r0 + h, w))
    yx, sc, valid, subpix = ex._level_grid_select(
        score, keep, cfg.ini_th_fast, cfg.min_th_fast, n0)
    uv_cpu = np.asarray(f_cpu.uv[:n0])
    yx_np = np.asarray(yx)
    m = np.asarray(valid) & np.asarray(f_cpu.mask[:n0])
    # same level-0 keypoint set (order may tie-break identically; compare
    # as sets of integer coords)
    got = {tuple(r) for r in yx_np[np.asarray(valid)]}
    want = {(int(round(v[1])), int(round(v[0])))
            for v in uv_cpu[np.asarray(f_cpu.mask[:n0])]}
    inter = len(got & want)
    assert inter >= 0.9 * max(len(want), 1), (len(got), len(want), inter)
