"""Multi-chip readiness (SURVEY.md §2.7/§7 stage 5; BASELINE
>=70%-at-2-hosts target): the fused step's SPMD partitioning is
shard-pixels/replicate-points — heavy per-camera image work one camera
per device, the small track/point tables replicated, ONE boundary
all-gather set per frame. These tests pin that contract via the
optimized HLO, which is hardware-independent (a virtual CPU mesh
serializes replicated compute onto the host cores, so wall-clock there
says nothing about chips — the collective census does)."""

import numpy as np

from coslam_tpu.parallel.scaling import (step_scaling,
                                         audit_step_collectives)


def test_fused_step_collective_census():
    """Exactly the designed boundary all-gathers, nothing else: no
    all-reduce, no collective-permute, no all-to-all (before the
    explicit-SPMD kernel, GSPMD propagation inserted ~900-2000 of them
    — per-camera scalar indexing into sharded axes)."""
    census = audit_step_collectives(n_devices=8)
    assert census["all-reduce"] == 0, census
    assert census["collective-permute"] == 0, census
    assert census["all-to-all"] == 0, census
    assert census["reduce-scatter"] == 0, census
    # track-table leaves + NCC blocks: ~13 small gathers; headroom for
    # minor XLA-version variation but an order-of-magnitude leak fails
    assert 1 <= census["all-gather"] <= 24, census


def test_step_scaling_harness_runs():
    """The wall-clock harness executes on sub-meshes and returns sane
    rows (the efficiency NUMBER is only meaningful on real multi-chip
    hardware; this pins the harness itself so it is ready the moment
    that hardware exists)."""
    rows = step_scaling(device_counts=(1, 2), n_cams=2, iters=2)
    assert [r["n_devices"] for r in rows] == [1, 2]
    assert all(np.isfinite(r["step_ms"]) and r["step_ms"] > 0
               for r in rows)
    assert rows[0]["efficiency"] == 1.0
