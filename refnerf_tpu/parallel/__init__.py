"""Device-mesh parallelism (L7): replaces the reference's PL-DDP/NCCL stack
with jax.sharding over ICI."""
