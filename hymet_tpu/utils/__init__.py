"""Shared utilities: config layer, logging, measurement."""
