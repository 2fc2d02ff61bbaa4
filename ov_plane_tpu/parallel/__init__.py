"""Distributed execution: mesh utilities, sharded measurement reduction, batch replay."""
