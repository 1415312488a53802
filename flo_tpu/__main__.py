"""`python -m flo_tpu` entry point -> the flo CLI."""

import sys

from .cli import main

sys.exit(main())
