"""Execution plans: staged, resumable pipeline runs with manifests."""
