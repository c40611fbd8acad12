"""Application layer: CLI entry, run loops, output contexts."""
