"""`python -m odgi_tpu.cli` entry point (reference: src/main.cpp:36-54)."""

import sys

from .main import main

sys.exit(main())
