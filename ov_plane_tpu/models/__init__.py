"""Estimator pipeline: feature bank, triage, MSCKF/SLAM/plane updaters, manager."""
