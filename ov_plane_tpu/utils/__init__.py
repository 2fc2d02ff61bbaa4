"""Utilities: config tree, chi2 tables, timing/metrics recorders."""
