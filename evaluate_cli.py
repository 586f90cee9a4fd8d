#!/usr/bin/env python
"""Convenience wrapper for `python -m ccnet_tpu.cli.evaluate`."""
from ccnet_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
