"""Command-line interface (reference: cli/main.py + cli/query.py)."""
