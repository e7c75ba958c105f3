"""Host-side utilities: audio I/O, clip model, pattern config, formatting."""
