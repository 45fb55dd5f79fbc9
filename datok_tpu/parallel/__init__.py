"""Multi-chip scaling: mesh-sharded corpus lanes, replicated tables."""
