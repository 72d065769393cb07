"""Distributed: device mesh + sharding."""
