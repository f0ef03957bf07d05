"""Pure-math primitives (L0). Everything here is jnp-traceable and side-effect
free so it fuses into the surrounding XLA program."""
