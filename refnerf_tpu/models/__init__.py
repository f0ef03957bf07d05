"""Model/ops layer (L3): volume rendering + Flax MLPs + the sampling cascade."""
