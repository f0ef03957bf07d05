"""Data layer (L2): scene loaders + host->device batch pipeline."""
