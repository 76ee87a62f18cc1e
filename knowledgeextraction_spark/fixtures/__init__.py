"""Deterministic synthetic corpus + artifacts (seed=42). See FIXTURES.md."""
