"""Math kernel library: batched, jit-friendly primitives used by the estimator."""
