"""Operator modules. Importing a module registers its queries (registry.py)."""
