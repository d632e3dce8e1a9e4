"""CLI entry points (reference main.py, test.py, quant_main.py)."""
