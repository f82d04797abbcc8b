"""Ray Data stages: map_batches kernels, actor pools, bucketed shuffles."""
