"""``python -m phoskintime_tpu`` entry point (reference ``__main__.py``)."""

import sys

from phoskintime_tpu.cli import main

main(sys.argv[1:])
