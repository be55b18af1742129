"""Commitment scheme (L2) and sigma protocols (L3)."""
