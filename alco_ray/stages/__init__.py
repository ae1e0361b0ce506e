"""Pipeline stages: vectorized map_batches bodies and actor-pool classes."""
