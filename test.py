#!/usr/bin/env python
"""Eval entry point (reference test.py). See codenet_tpu/cli/test.py."""
from codenet_tpu.cli.test import main

if __name__ == "__main__":
    main()
