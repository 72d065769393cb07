"""Utilities: config, logging."""
