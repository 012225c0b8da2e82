"""Relational operators: extraction, ontology mapping, triple emission,
cross-dashboard analytics, diff/merge, drift, canonicalization, dedup."""
