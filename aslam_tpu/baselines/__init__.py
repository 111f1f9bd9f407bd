"""CPU reference-semantics baselines (accuracy yardsticks, not TPU code)."""
