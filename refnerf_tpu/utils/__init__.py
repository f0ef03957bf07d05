"""Utilities: IO helpers and the gin-compatible configuration system."""
