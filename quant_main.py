#!/usr/bin/env python
"""QAT training entry point (reference quant_main.py).
See codenet_tpu/cli/quant_main.py."""
from codenet_tpu.cli.quant_main import main

if __name__ == "__main__":
    main()
