"""Detection models: pattern-bank compilation and the streaming engine."""
