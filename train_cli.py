#!/usr/bin/env python
"""Convenience wrapper for `python -m ccnet_tpu.cli.train`."""
from ccnet_tpu.cli.train import main

if __name__ == "__main__":
    main()
