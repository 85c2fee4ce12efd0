"""frame_steps_scan (chunked core, one device call for many frames) must
be step-for-step identical to sequential frame_step calls."""

import numpy as np
import jax.numpy as jnp

from coslam_tpu.config import small_test_config
from coslam_tpu.slam.state import init_state
from coslam_tpu.slam.fused import (frame_step, frame_steps_scan,
                                   unpack_stats)
from coslam_tpu.ops import build_pyramid
from coslam_tpu.ops.image import gaussian_blur


def test_scan_matches_sequential(rng):
    cfg = small_test_config(num_cameras=2)
    C, H, W = 2, cfg.image_height, cfg.image_width
    imgs = gaussian_blur(jnp.asarray(rng.uniform(0, 255, (C, H, W)),
                                     jnp.float32))
    K = jnp.broadcast_to(jnp.asarray(
        [[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], jnp.float32),
        (C, 3, 3))
    kc = jnp.zeros((C, 5), jnp.float32)
    seq = jnp.stack([jnp.roll(imgs, i, axis=-1) for i in range(1, 5)])
    s_scan, _, stats = frame_steps_scan(
        init_state(cfg), build_pyramid(imgs, cfg.klt.n_levels), seq, K, kc,
        cfg)
    s_seq, pyr = init_state(cfg), build_pyramid(imgs, cfg.klt.n_levels)
    per_frame = []
    for i in range(seq.shape[0]):
        s_seq, pyr, fs = frame_step(s_seq, pyr, seq[i], K, kc, cfg)
        per_frame.append(fs)
    assert int(s_scan.frame) == int(s_seq.frame)
    assert np.allclose(np.asarray(s_scan.tracks.pos),
                       np.asarray(s_seq.tracks.pos))
    assert np.array_equal(np.asarray(s_scan.tracks.valid),
                          np.asarray(s_seq.tracks.valid))
    assert np.allclose(np.asarray(s_scan.mappts.xyz),
                       np.asarray(s_seq.mappts.xyz))
    # stacked packed stats row i == frame i's stats
    D = int(s_seq.kfs.dyn_xyz.shape[1])
    for i, fs in enumerate(per_frame):
        row = unpack_stats(np.asarray(stats[i]), C, D)
        assert np.allclose(row.n_tracked, np.asarray(fs.n_tracked))
        assert np.allclose(row.R, np.asarray(fs.R), atol=1e-6)
