"""Scalar / vectorized function library (pandas UDFs + column expressions)."""
