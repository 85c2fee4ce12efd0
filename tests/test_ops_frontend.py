import numpy as np
import jax
import jax.numpy as jnp

from coslam_tpu.config import KLTConfig
from coslam_tpu.ops import (build_pyramid, sample_bilinear, extract_patches,
                            klt_track, detect_corners, extract_ncc_blocks,
                            ncc_score_matrix)
from coslam_tpu.ops.image import gaussian_blur


def smooth_texture(rng, h, w, blur_passes=2, scale=255.0):
    """Trackable smooth random texture in [0, scale]."""
    img = rng.uniform(0, 1, (1, h, w)).astype(np.float32)
    x = jnp.asarray(img)
    for _ in range(blur_passes):
        x = gaussian_blur(x)
    x = x - x.min()
    x = x / (x.max() + 1e-9) * scale
    return x  # [1, h, w]


def warp_translate(img, dx, dy):
    """Bilinear-shift a [1, H, W] image by (dx, dy) (content moves by +d)."""
    h, w = img.shape[1:]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    pts = jnp.stack([xs - dx, ys - dy], axis=-1)
    vals, _ = sample_bilinear(img[0], pts)
    return vals[None]


def test_pyramid_shapes(rng):
    img = smooth_texture(rng, 64, 96)
    pyr = build_pyramid(img, 3)
    assert pyr.imgs[0].shape == (1, 64, 96)
    assert pyr.imgs[1].shape == (1, 32, 48)
    assert pyr.imgs[2].shape == (1, 16, 24)
    # derivatives: level 0 only (the corner detector is their only
    # consumer; KLT differentiates its own template windows)
    assert len(pyr.dxs) == 1 and len(pyr.dys) == 1
    assert pyr.dxs[0].shape == (1, 64, 96)


def test_sample_bilinear_exact():
    # linear ramp: f(x, y) = 2x + 3y  -> bilinear must be exact
    h, w = 16, 16
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = jnp.asarray((2.0 * xs + 3.0 * ys).astype(np.float32))
    pts = jnp.array([[1.5, 2.25], [10.1, 3.9], [0.0, 0.0]], dtype=jnp.float32)
    vals, ok = sample_bilinear(img, pts)
    expect = 2.0 * np.array([1.5, 10.1, 0.0]) + 3.0 * np.array([2.25, 3.9, 0.0])
    np.testing.assert_allclose(np.asarray(vals), expect, rtol=1e-5)
    assert bool(jnp.all(ok))


def test_extract_patches_border_invalid(rng):
    img = smooth_texture(rng, 32, 32)[0]
    centers = jnp.array([[16.0, 16.0], [1.0, 16.0], [30.5, 16.0]], dtype=jnp.float32)
    _, valid = extract_patches(img, centers, radius=3)
    assert bool(valid[0])
    assert not bool(valid[1])
    assert not bool(valid[2])


def test_detect_corners_finds_blobs(rng):
    h, w = 96, 128
    img = np.zeros((1, h, w), dtype=np.float32)
    truth = [(30, 40), (60, 90), (20, 100), (70, 30)]
    for (y, x) in truth:
        img[0, y - 1:y + 2, x - 1:x + 2] = 255.0
    pyr = build_pyramid(jnp.asarray(img), 1)
    cfg = KLTConfig(min_cornerness=10.0, min_distance=5)
    res = detect_corners(pyr.imgs[0], pyr.dxs[0], pyr.dys[0], cfg, k=32)
    found = np.asarray(res.pos[0][np.asarray(res.valid[0])])
    assert len(found) >= len(truth)
    for (y, x) in truth:
        d = np.linalg.norm(found - np.array([x, y]), axis=-1).min()
        assert d <= 2.0, f"blob at {(x, y)} not found (min dist {d})"


def test_detect_corners_exclusion(rng):
    h, w = 96, 128
    img = np.zeros((1, h, w), dtype=np.float32)
    img[0, 29:32, 39:42] = 255.0
    img[0, 59:62, 89:92] = 255.0
    pyr = build_pyramid(jnp.asarray(img), 1)
    cfg = KLTConfig(min_cornerness=10.0, min_distance=5)
    excl = jnp.array([[[40.0, 30.0]]], dtype=jnp.float32)  # [C=1, M=1, 2]
    res = detect_corners(pyr.imgs[0], pyr.dxs[0], pyr.dys[0], cfg, k=32,
                         exclude_pos=excl,
                         exclude_valid=jnp.ones((1, 1), dtype=bool))
    found = np.asarray(res.pos[0][np.asarray(res.valid[0])])
    d_excluded = np.linalg.norm(found - np.array([40.0, 30.0]), axis=-1).min()
    assert d_excluded > 4.0  # the blob under the live track is suppressed
    d_other = np.linalg.norm(found - np.array([90.0, 60.0]), axis=-1).min()
    assert d_other <= 2.0


def track_shifted(rng, dx, dy, cfg, gain=1.0, h=120, w=160, n=32):
    img0 = smooth_texture(rng, h, w)
    img1 = warp_translate(img0, dx, dy) * gain
    pyr0 = build_pyramid(img0, cfg.n_levels)
    pyr1 = build_pyramid(img1, cfg.n_levels)
    pos = jnp.asarray(
        rng.uniform([20, 20], [w - 20, h - 20], (1, n, 2)).astype(np.float32))
    valid = jnp.ones((1, n), dtype=bool)
    res = klt_track(pyr0, pyr1, pos, valid, cfg)
    return pos, res


def test_klt_small_translation(rng):
    cfg = KLTConfig(n_levels=3, track_with_gain=False)
    dx, dy = 1.3, -0.7
    pos, res = track_shifted(rng, dx, dy, cfg)
    ok = np.asarray(res.valid[0])
    assert ok.mean() > 0.8
    disp = np.asarray(res.pos[0] - pos[0])[ok]
    np.testing.assert_allclose(disp.mean(0), [dx, dy], atol=0.1)
    assert np.abs(disp - [dx, dy]).max() < 0.5


def test_klt_large_translation_needs_pyramid(rng):
    cfg = KLTConfig(n_levels=4, track_with_gain=False)
    dx, dy = 9.0, -6.0
    pos, res = track_shifted(rng, dx, dy, cfg)
    ok = np.asarray(res.valid[0])
    assert ok.mean() > 0.6
    disp = np.asarray(res.pos[0] - pos[0])[ok]
    np.testing.assert_allclose(np.median(disp, 0), [dx, dy], atol=0.2)


def test_klt_with_gain(rng):
    cfg = KLTConfig(n_levels=3, track_with_gain=True)
    dx, dy = 2.0, 1.0
    pos, res = track_shifted(rng, dx, dy, cfg, gain=0.8)
    ok = np.asarray(res.valid[0])
    assert ok.mean() > 0.7
    disp = np.asarray(res.pos[0] - pos[0])[ok]
    np.testing.assert_allclose(np.median(disp, 0), [dx, dy], atol=0.2)
    # template T ~ g * I with I = 0.8 T  =>  g ~ 1.25
    gains = np.asarray(res.gain[0])[ok]
    np.testing.assert_allclose(np.median(gains), 1.25, atol=0.1)


def test_klt_without_gain_fails_under_gain_change(rng):
    """Sanity: strong illumination change breaks SSD gating without gain."""
    cfg = KLTConfig(n_levels=3, track_with_gain=False)
    _, res_nogain = track_shifted(rng, 2.0, 1.0, cfg, gain=0.5)
    cfg_g = KLTConfig(n_levels=3, track_with_gain=True)
    _, res_gain = track_shifted(rng, 2.0, 1.0, cfg_g, gain=0.5)
    assert float(jnp.mean(res_gain.valid)) > float(jnp.mean(res_nogain.valid))


def test_ncc_blocks_and_matrix(rng):
    img = smooth_texture(rng, 64, 64)[0]
    pos = jnp.asarray(rng.uniform(15, 48, (8, 2)).astype(np.float32))
    blocks, ok = extract_ncc_blocks(img, pos, radius=5)
    assert bool(jnp.all(ok))
    s = ncc_score_matrix(blocks, blocks, ok, ok)
    np.testing.assert_allclose(np.asarray(jnp.diag(s)), 1.0, atol=1e-4)
    off = np.asarray(s - jnp.eye(8))
    assert off.max() < 0.999
    # invalid handling
    ok2 = ok.at[0].set(False)
    s2 = ncc_score_matrix(blocks, blocks, ok2, ok2)
    assert float(s2[0, 1]) == -2.0


def test_tvl1_flow_translation(rng):
    """TV-L1 flow recovers a uniform translation (parity op for the
    reference's unused v3d_gpuflow module)."""
    from coslam_tpu.ops.flow import tvl1_flow
    img0 = smooth_texture(rng, 64, 80)
    img1 = warp_translate(img0, 3.0, -2.0)
    flow = tvl1_flow(img0, img1, n_levels=3, n_warps=5, n_iters=30,
                     lam=0.5)
    # flow maps img0 pixels to img1 positions: content moved by (+3, -2)
    inner = np.asarray(flow[0, 12:-12, 12:-12])
    med = np.median(inner.reshape(-1, 2), axis=0)
    np.testing.assert_allclose(med, [3.0, -2.0], atol=0.5)


def test_detect_corners_block_reduce_matches_per_pixel(rng):
    # Regression: the block-reduced top-k path must return exactly the
    # corners of the per-pixel formulation, including when the image size
    # is NOT a multiple of the block (padding used to shift block origins).
    h, w = 150, 200           # 200 % (min_distance+1) != 0
    img = smooth_texture(rng, h, w)
    pyr = build_pyramid(img, 1)
    cfg = KLTConfig(min_cornerness=10.0, min_distance=5)
    k = 64
    res = detect_corners(pyr.imgs[0], pyr.dxs[0], pyr.dys[0], cfg, k=k)
    # per-pixel reference (the pre-block-reduce algorithm)
    from coslam_tpu.ops.corners import cornerness_map
    from coslam_tpu.ops.image import max_pool_same
    corner = np.asarray(cornerness_map(pyr.dxs[0], pyr.dys[0],
                                       cfg.window_radius))[0]
    b = cfg.border
    m = np.zeros((h, w), bool)
    m[b:h - b, b:w - b] = True
    corner = np.where(m, corner, 0.0)
    pooled = np.asarray(max_pool_same(jnp.asarray(corner)[None],
                                      cfg.min_distance))[0]
    is_max = (corner >= pooled) & (corner > cfg.min_cornerness)
    masked = np.where(is_max, corner, 0.0).ravel()
    ref_idx = np.argsort(-masked, kind="stable")[:k]
    ref = {int(i) for i in ref_idx if masked[i] > 0}
    got_pos = np.asarray(res.pos[0])
    got_ok = np.asarray(res.valid[0])
    got = {int(got_pos[i, 1]) * w + int(got_pos[i, 0])
           for i in range(k) if got_ok[i]}
    assert got == ref


def test_extract_windows_exact(rng):
    # extract_windows (gather fallback; the pallas path is validated
    # against it on TPU — both are exact pixel selections)
    from coslam_tpu.ops.patches import extract_windows
    C, h, w, n, g = 2, 150, 200, 64, 14
    imgs = jnp.asarray(rng.uniform(0, 255, (C, h, w)), jnp.float32)
    bx = rng.integers(0, w - g, (C, n))
    by = rng.integers(0, h - g, (C, n))
    base = jnp.asarray(np.stack([bx, by], -1), jnp.int32)
    out = np.asarray(extract_windows(imgs, base, g))      # [g, g, C, n]
    imgs_np = np.asarray(imgs)
    for c in range(C):
        for i in range(0, n, 7):
            x0, y0 = int(bx[c, i]), int(by[c, i])
            np.testing.assert_array_equal(
                out[:, :, c, i], imgs_np[c, y0:y0 + g, x0:x0 + g])
