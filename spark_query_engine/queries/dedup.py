"""Placeholder — filled in during round 1."""
