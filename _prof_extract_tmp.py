"""Ad-hoc: fine-grained extraction stage timing on the real TPU (slope).

Mirrors the PACKED extractor structure (frontend/extractor.py)."""
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
import numpy as np

from orb_slam3_ros2_tpu.frontend import extractor as ex
from orb_slam3_ros2_tpu.ops import orb_descriptor as desc_ops
from orb_slam3_ros2_tpu.ops import pallas_kernels as pk
from orb_slam3_ros2_tpu.ops import pyramid as pyr_ops

H, W = 480, 752
cfg = ex.ExtractorConfig(n_features=1000, n_levels=8, height=H, width=W)
budgets = pyr_ops.features_per_level(cfg.n_features, cfg.n_levels,
                                     cfg.scale_factor)
scales = pyr_ops.scale_factors(cfg.n_levels, cfg.scale_factor)
EDGE = ex.EDGE

def upto(stage):
    def run(img):
        levels = pyr_ops.build_pyramid(img, cfg.n_levels, cfg.scale_factor)
        if stage == "pyramid":
            return levels[-1].mean()
        score_c, keep_c, blur_c, raw_c, layout = pk.frontend_pass_packed(
            levels)
        if stage == "packed":
            return score_c.sum() + blur_c.mean() + raw_c.mean()
        acc = jnp.float32(0)
        yx_all = []
        for lvl, ((r0, h, w), budget) in enumerate(zip(layout, budgets)):
            if budget <= 0:
                continue
            score = jax.lax.slice(score_c, (r0, 0), (r0 + h, w))
            keep = jax.lax.slice(keep_c, (r0, 0), (r0 + h, w))
            yx, sc, valid, subpix = ex._level_grid_select(
                score, keep, cfg.ini_th_fast, cfg.min_th_fast, budget)
            yx = jnp.clip(yx, EDGE, jnp.asarray([h - EDGE - 1, w - EDGE - 1]))
            acc = acc + yx.sum() + sc.sum()
            yx_all.append(yx + jnp.asarray([r0, 0], jnp.int32))
        if stage == "select":
            return acc
        yx_packed = jnp.concatenate(yx_all, axis=0)
        pr, pd = desc_ops.gather_patches_multi((raw_c, blur_c), yx_packed)
        if stage == "gather":
            return pr.sum() + pd.sum()
        ang = desc_ops.orientations(pr)
        if stage == "orient":
            return ang.sum()
        signs, bits = desc_ops.describe(pd, ang)
        return signs.sum() + ang.sum()
    return run

def slope(fn):
    times = {}
    rng = np.random.default_rng(0)
    for nb in (16, 128):
        f = jax.jit(lambda frames: jax.lax.scan(
            lambda c, img: (c + fn(img), 0.0), jnp.float32(0), frames)[0])
        fr = jnp.asarray(rng.uniform(0, 255, (nb, H, W)).astype(np.float32))
        _ = float(f(fr))  # forced fetch: relay block_until_ready can no-op
        reps = []
        for _ in range(5):
            fr = fr + 0.001
            jax.block_until_ready(fr)
            t0 = time.perf_counter()
            _ = float(f(fr))
            reps.append(time.perf_counter() - t0)
        times[nb] = float(np.median(reps[1:]))
    return (times[128] - times[16]) / 112

prev = 0.0
for st in ["pyramid", "packed", "select", "gather", "orient", "describe"]:
    t = slope(upto(st))
    print(f"{st:10s} cum {t*1e3:7.3f} ms  delta {(t-prev)*1e3:7.3f} ms",
          flush=True)
    prev = t
