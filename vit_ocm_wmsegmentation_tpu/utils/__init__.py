"""Shared infrastructure: config tree, logging, seeding, meters."""
