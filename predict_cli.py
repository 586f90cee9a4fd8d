#!/usr/bin/env python
"""Convenience wrapper for `python -m ccnet_tpu.cli.predict`."""
from ccnet_tpu.cli.predict import main

if __name__ == "__main__":
    main()
