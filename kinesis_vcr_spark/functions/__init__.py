"""Scalar / aggregate function layer."""
