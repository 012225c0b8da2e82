"""Column-expression helpers and Arrow-vectorized parser UDFs."""
