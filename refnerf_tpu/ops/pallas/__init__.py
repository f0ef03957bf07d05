"""Hand-written Pallas TPU kernels for ops XLA fuses poorly."""
