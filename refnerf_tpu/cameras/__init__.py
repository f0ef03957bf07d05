"""Ray/camera geometry (L1): pytree ray containers + device-side ray casting."""
