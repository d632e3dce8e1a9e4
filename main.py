#!/usr/bin/env python
"""FP32 training entry point (reference main.py). See codenet_tpu/cli/main.py."""
from codenet_tpu.cli.main import main

if __name__ == "__main__":
    main()
