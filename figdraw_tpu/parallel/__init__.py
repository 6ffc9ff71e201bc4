"""Multi-chip scale-out: tile-space sharding of the rasterizer over a Mesh."""
