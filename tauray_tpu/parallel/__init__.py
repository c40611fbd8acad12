"""Multi-device distribution: mesh setup, image-space sharding strategies,
stitch, and dynamic load balancing (reference: src/distribution_strategy.cc,
src/stitch_stage.cc, src/load_balancer.cc).

The reference shards one frame's pixels across GPUs with explicit transfers
and a stitch pass; here the same strategies become `shard_map` programs
over a `jax.sharding.Mesh`, with the stitch collapsing into an
`all_gather` over ICI (SURVEY.md §5.7-5.8 mapping).
"""

from .distribution import (DistributionStrategy, calculate_shuffled_strips_b,
                           get_device_distribution_params, permute_region_id)
from .mesh import make_mesh
from .load_balancer import LoadBalancer
