"""Multi-chip parallelism: mesh construction, tensor-parallel serving via
shard_map, data-parallel calibration. All collectives ride ICI (psum /
all_gather over the mesh) — a new capability with no reference counterpart
(SURVEY.md §2.4)."""
