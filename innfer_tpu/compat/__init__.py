"""Host-side compatibility paths (optional dependencies, lazy imports)."""
