"""Multi-chip scaling: device meshes, sharded distributed bundle adjustment."""
