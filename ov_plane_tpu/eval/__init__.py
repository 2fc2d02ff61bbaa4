"""Evaluation: trajectory alignment, ATE/RPE, RMSE/NEES (reference: ov_eval)."""
