"""I/O: synthetic scene rendering, video readers, calibration parsing,
result export (CoSLAM-compatible), and trajectory evaluation (ATE).

The reference has no test assets in-repo (SURVEY.md §4); the synthetic
renderer here is the integration-test substrate: exact ground-truth poses
and geometry with controllable dynamic objects.
"""
