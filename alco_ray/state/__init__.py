"""Shared state: checkpoint manifests and broadcast artifacts."""
