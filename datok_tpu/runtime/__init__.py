"""Runtime layer: scalar oracle, batched device engine, emission/formatting."""
