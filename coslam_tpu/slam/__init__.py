"""SLAM core: fixed-capacity SoA state, device step functions, and the
host-side pipeline orchestrator.

Replaces the reference's pointer-linked data model (SL_FeaturePoint /
SL_MapPoint / SL_Camera / SL_KeyPoseList intrusive lists — SURVEY.md §2.3)
and the CoSLAM/SingleSLAM orchestration (§2.5) with statically-shaped
arrays + validity masks so every per-frame stage is one jitted device
call batched over cameras.
"""

from coslam_tpu.slam.state import (  # noqa: F401
    TrackTable, MapPoints, KeyframeStore, SlamState, init_state,
    PT_STATIC, PT_DYNAMIC, PT_UNCERTAIN, ST_FREE, ST_ALIVE, ST_FALSE,
)
from coslam_tpu.slam.pipeline import CoSlamEngine  # noqa: F401
